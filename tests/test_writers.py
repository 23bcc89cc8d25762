"""Output writers (txt/json/srt/vtt/tsv) — OpenAI whisper CLI parity."""
import json

import pytest

from openai_whisper_compression_tpu.utils.writers import (FORMATS, get_writer,
                                                          write_result)

RESULT = {
    "text": "hello world again",
    "segments": [
        {"start": 0.0, "end": 1.5, "text": " hello world"},
        {"start": 1.5, "end": 3.75, "text": " again"},
    ],
}


def test_txt(tmp_path):
    p = write_result(RESULT, "txt", str(tmp_path / "a.txt"))
    assert open(p).read() == "hello world\nagain\n"


def test_json_roundtrip(tmp_path):
    p = write_result(RESULT, "json", str(tmp_path / "a.json"))
    assert json.load(open(p)) == RESULT


def test_srt_format(tmp_path):
    p = write_result(RESULT, "srt", str(tmp_path / "a.srt"))
    body = open(p).read()
    assert "1\n00:00:00,000 --> 00:00:01,500\nhello world\n\n" in body
    assert "2\n00:00:01,500 --> 00:00:03,750\nagain\n\n" in body


def test_vtt_format(tmp_path):
    p = write_result(RESULT, "vtt", str(tmp_path / "a.vtt"))
    body = open(p).read()
    assert body.startswith("WEBVTT\n\n")
    assert "00:00:00.000 --> 00:00:01.500\nhello world\n" in body


def test_tsv_milliseconds(tmp_path):
    p = write_result(RESULT, "tsv", str(tmp_path / "a.tsv"))
    lines = open(p).read().splitlines()
    assert lines[0] == "start\tend\ttext"
    assert lines[1] == "0\t1500\thello world"
    assert lines[2] == "1500\t3750\tagain"


def test_clock_rollover(tmp_path):
    res = {"text": "x", "segments": [{"start": 3661.25, "end": 3662.0,
                                      "text": "x"}]}
    p = write_result(res, "srt", str(tmp_path / "a.srt"))
    assert "01:01:01,250 --> 01:01:02,000" in open(p).read()


def test_segmentless_result_synthesises_whole_audio(tmp_path):
    res = {"text": "plain decode"}
    p = write_result(res, "srt", str(tmp_path / "a.srt"), duration=2.5)
    assert "00:00:00,000 --> 00:00:02,500\nplain decode" in open(p).read()
    # tsv too, via the same synthesised segment
    p = write_result(res, "tsv", str(tmp_path / "a.tsv"), duration=2.5)
    assert open(p).read().splitlines()[1] == "0\t2500\tplain decode"


def test_open_ended_segment_gets_pad(tmp_path):
    res = {"text": "x", "segments": [{"start": 1.0, "end": None,
                                      "text": "x"}]}
    p = write_result(res, "vtt", str(tmp_path / "a.vtt"))
    assert "00:00:01.000 --> 00:00:02.000" in open(p).read()


def test_get_writer_all(tmp_path):
    writer = get_writer("all", str(tmp_path))
    paths = writer(RESULT, "/audio/clip.wav", duration=4.0)
    assert sorted(p.rsplit(".", 1)[1] for p in paths) == sorted(FORMATS)
    for p in paths:
        assert (tmp_path / p.rsplit("/", 1)[1]).exists()
        assert p.rsplit("/", 1)[1].startswith("clip.")


def test_unknown_format_raises(tmp_path):
    with pytest.raises(ValueError, match="unknown output format"):
        write_result(RESULT, "docx", str(tmp_path / "a.docx"))
    with pytest.raises(ValueError, match="unknown output format"):
        get_writer("docx", str(tmp_path))

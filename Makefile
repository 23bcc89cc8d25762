# Developer entry points (≈ reference Makefile: check/test — `Makefile:4-21`).

.PHONY: test native bench example check real-wer real-wer-rehearse

# The BASELINE WER comparison artifact (reference notebook cell 15:
# FP32 whisper-small, 100 test-clean utts, WER 0.0473 -> WER_REAL.json).
# Needs any mountable weight source + LibriSpeech audio; see
# tools/real_wer.py for the resolution order.
real-wer:
	python tools/real_wer.py

# Zero-egress rehearsal of the identical path: fake checkpoints in all
# three ingestion formats -> loaders -> eval -> artifact.
real-wer-rehearse:
	python tools/real_wer.py --rehearse --out WER_REHEARSAL.json

test:
	python -m pytest tests/ -q

native:
	$(MAKE) -C runtime

bench:
	python bench.py --kernel-smoke
	python bench.py

example:
	python examples/compress_store_serve.py
	python examples/timestamps_and_profiling.py
	python examples/serving_and_speculative.py

# static hygiene gate (≈ reference pre-commit ruff/mypy/vulture,
# `.pre-commit-config.yaml:12-47` — those tools aren't in this image, so
# tools/astlint.py implements F401/F821/F811/F541/B006/E711/E722 natively)
check:
	python -m compileall -q openai_whisper_compression_tpu bench.py __graft_entry__.py
	python tools/astlint.py
	@echo "check OK"

# every performance number README/STATUS quote must exist in a committed
# artifact (tools/claims_check.py pins doc regex -> artifact JSON path)
claims:
	python tools/claims_check.py

# Single-command gates for pair_allegro_tpu (see .claude/skills/verify/SKILL.md).
#
# verify-tpu is the MANDATORY on-chip gate for any Pallas kernel change: the
# interpret-mode CPU tests cannot see the Mosaic miscompile class, so the
# fused-stack kernel parity tier must run on real hardware before landing
# (round-3 review item #8).

PY_TPU := PYTHONPATH=/root/repo:/root/.axon_site

.PHONY: test verify-tpu bench native

test:            ## full CPU suite (f64 oracle + 8-virtual-device mesh legs)
	python -m pytest tests/ -q

verify-tpu:      ## on-chip kernel gate: fused-stack + per-layer TP + NequIP conv parity (fwd+VJP)
	PAT_TEST_TPU=1 $(PY_TPU) python -m pytest tests/test_stack_fused.py tests/test_nequip_fused.py -q

bench:           ## headline benchmark (real TPU; prints one JSON line)
	$(PY_TPU) python bench.py

native:          ## build the C++ host extension
	$(MAKE) -C csrc

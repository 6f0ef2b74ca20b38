# Convenience entries. The heavy lifting lives in python -m modules so every
# target is one self-documenting command.

PY := python

.PHONY: test bench train-bench multichip parity parity-dry

test:
	$(PY) -m pytest tests/ -x -q

bench:
	$(PY) bench.py

train-bench:
	$(PY) bench_train.py

multichip:
	$(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

# Weights-day parity runbook (see imagdressing_tpu/tools/parity.py --help):
# on a machine with the reference checkpoints this records goldens, replays
# them through our converted weights at fp32 tolerance, arms the pytest
# gate, and renders the seed-42 comparison image.
parity:
	$(PY) -m imagdressing_tpu.tools.parity

# Same flow end-to-end on the synthetic stack — runs in this image.
parity-dry:
	$(PY) -m imagdressing_tpu.tools.parity --dry-run --out_dir /tmp/parity_dry

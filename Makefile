.PHONY: test test-fast bench bench-tiny smoke dryrun entry train-bench

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x --ignore=tests/test_cli_train.py

bench:
	python bench.py

bench-tiny:
	python bench.py --tiny --steps 5 --iters 2

train-bench:
	python benchmarks/train_bench.py --batch 1 --iters 3

bench-all:
	python benchmarks/run_all.py

smoke:
	python -m diffute_tpu.train.run_vae --smoke --report_to none --output_dir /tmp/diffute_smoke_vae
	python -m diffute_tpu.train.run_unet --smoke --report_to none --output_dir /tmp/diffute_smoke_unet

dryrun:
	python __graft_entry__.py dryrun 8

entry:
	python __graft_entry__.py

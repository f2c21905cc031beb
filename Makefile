# Convenience targets. CPU=1 prefixes force the CPU backend (tests default
# to CPU via tests/conftest.py regardless).

CPU_ENV = JAX_PLATFORM_NAME=cpu JAX_PLATFORMS=cpu

.PHONY: test native bench bench-smoke smoke tpu-smoke clean

# Mosaic-compile every Pallas kernel (fwd+bwd) + pallas-in-shard_map on a
# real chip — the coverage CPU CI structurally cannot provide.
tpu-smoke:
	python tpu_smoke.py

test:
	python -m pytest tests/ -q

native:
	python -c "from kgat_tpu import native; print(native._SO)"

bench:
	python bench.py

bench-smoke:
	$(CPU_ENV) python bench.py --preset smoke --iters 3 --backend ref

smoke:
	$(CPU_ENV) python -m kgat_tpu.train --preset smoke-gcn --epochs 10 \
	    --eval-every 5 --run-name smoke

clean:
	rm -rf runs kgat_tpu/native/libkgat_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +

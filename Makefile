# owlvit_tpu developer entry points (reference had only conda/pip targets).

.PHONY: test native bench train synth clean

test:
	python -m pytest tests/ -x -q

native:
	g++ -O3 -shared -fPIC -o owlvit_tpu/native/libowlvit_native.so \
		owlvit_tpu/native/src/owlvit_native.cpp

bench:
	JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache python bench.py

synth:
	python -m owlvit_tpu.cli make-synthetic --root /tmp/owlvit_synth --n-train 64

train:
	JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache \
		python -m owlvit_tpu.cli train --config config.yaml

clean:
	rm -rf owlvit_tpu/native/libowlvit_native.so .pytest_cache \
		$(shell find . -name __pycache__ -type d)

.PHONY: test native bench bench-scaling clean

test:
	python -m pytest tests/ -q

native: gf2bv_tpu/_native/libgf2native.so

gf2bv_tpu/_native/libgf2native.so: gf2bv_tpu/_native/native.c
	gcc -O3 -march=native -funroll-loops -fopenmp -shared -fPIC -o $@ $<

bench:
	python bench.py

bench-scaling:
	python bench_scaling.py

clean:
	rm -f gf2bv_tpu/_native/libgf2native.so
	find . -name __pycache__ -type d -exec rm -rf {} +

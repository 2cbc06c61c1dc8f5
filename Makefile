# Convenience targets. The package itself needs no build step; `native`
# compiles the optional C++ bit-packing library (also auto-built on first use
# by fractencode_tpu/codec/native.py).

.PHONY: all native test bench clean

all: native

native: native/_bitpack.so

native/_bitpack.so: native/bitpack.cpp
	g++ -O2 -shared -fPIC -std=c++17 -o $@ $<

test:
	python scripts/check_docs.py
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -f native/_bitpack.so

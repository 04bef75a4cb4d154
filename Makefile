# rnabloom-tpu developer targets

NATIVE_SRC := rnabloom_tpu/native/fastxio.cpp
NATIVE_LIB := rnabloom_tpu/native/_fastxio.so

.PHONY: all native test test-fast bench clean

all: native

native: $(NATIVE_LIB)

$(NATIVE_LIB): $(NATIVE_SRC)
	g++ -O3 -march=native -shared -fPIC $< -lz -o $@

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

clean:
	rm -f $(NATIVE_LIB)
	find . -name __pycache__ -type d -exec rm -rf {} +

# maskunet-tpu convenience targets

CXX ?= g++
CXXFLAGS ?= -O3 -march=native -shared -fPIC

.PHONY: all native test test-fast bench parity clean

all: native

native: csrc/libmaskops.so

csrc/libmaskops.so: csrc/maskops.cpp
	$(CXX) $(CXXFLAGS) $< -o $@

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow" --ignore=tests/test_task_evaluators.py

bench:
	python bench.py

# compiled-kernel parity on the real TPU (tests use interpret mode)
parity:
	python tools/tpu_kernel_paritycheck.py

clean:
	rm -f csrc/libmaskops.so

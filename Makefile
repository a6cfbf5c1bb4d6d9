# posetpu build/test/bench entry points
# (the C++ decode pool also builds lazily on first import; this Makefile
# exists for explicit builds and CI-style runs)

CXX ?= g++
CXXFLAGS ?= -O3 -shared -fPIC -std=c++17
NATIVE_SRC := posetpu/native/decode_pool.cpp
NATIVE_LIB := posetpu/native/libposetpu_decode.so

.PHONY: all native test bench quickbench install clean

all: native

native: $(NATIVE_LIB)

$(NATIVE_LIB): $(NATIVE_SRC)
	$(CXX) $(CXXFLAGS) $< -ljpeg -lpthread -o $@

install:
	pip install -e . --no-build-isolation --no-deps

test:
	python -m pytest tests/ -x -q

smoke:  # fast tier (<2 min on a multi-core host)
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

quickbench:
	python bench.py --quick

benchmatrix:  # full round measurement campaign (JSONL log, fail-fast)
	python tools/bench_matrix.py

watch:  # probe loop that FIRES benchmatrix on first tunnel recovery and
	# resumes missing stages after mid-window wedges (VERDICT r4 item 1)
	python tools/campaign_watch.py

clean:
	rm -f $(NATIVE_LIB)

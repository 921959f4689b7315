.PHONY: all native test bench clean

all: native

native: native/libpangulu_host.so

native/libpangulu_host.so: native/pangulu_host.cpp
	g++ -O3 -shared -fPIC -std=c++17 -o $@ $<

test: native
	python -m pytest tests/ -x -q

bench: native
	python bench.py

clean:
	rm -f native/libpangulu_host.so

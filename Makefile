.PHONY: test bench native clean microbench

test:
	python -m pytest tests/ -q

bench:
	python bench.py

microbench:
	python benchmarks/microbench.py

native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +

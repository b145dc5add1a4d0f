# Developer entry points (reference Makefile parity: `make test` etc.)

.PHONY: test native bench eval clean

test:
	python -m pytest tests/ -q

native:
	$(MAKE) -C native

bench:
	python bench.py

eval:
	python -m triple_hybrid_rag_tpu eval

clean:
	$(MAKE) -C native clean
	rm -rf .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +

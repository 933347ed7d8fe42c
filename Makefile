.PHONY: dist test bench scaling clean

dist:
	mkdir -p dist
	rm -f dist/openie_spark.zip
	cd . && zip -qr dist/openie_spark.zip openie_spark -x '*__pycache__*'

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

scaling:
	python jobs/bench_scaling.py

clean:
	rm -rf dist .fixtures/*.tmp.parquet

.PHONY: dist test bench scaling round clean

# Round close-out: host probe (refuses on degraded host), full driver-
# replica correctness sweep at sf0.01, then bench.py — artifacts written
# as CORRECTNESS_local.json / BENCH_local.json with probe stamps.
round:
	python jobs/round_artifacts.py

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

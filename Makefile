# Developer entry points.

.PHONY: test native bench maze planning demo clean

test:
	python -m pytest tests/ -q

native:
	python -c "from sigsvgd_tpu.native.collision import build_native_library; print(build_native_library(force=True))"

bench:
	python bench.py

maze:
	python -m sigsvgd_tpu.experiments.maze --kernel signature --steps 300

planning:
	python -m sigsvgd_tpu.experiments.robot_planning --scenes pillars_4 --quick

demo:
	python examples/demo_svgd_toy.py

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; rm -rf .pytest_cache

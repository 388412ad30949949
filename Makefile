# Development entry points (CLAUDE.md documents the full command set).

.PHONY: test lint bench

test:
	python -m pytest tests/ -q

# Style/type gates: uses ruff+mypy when installed, always runs the
# stdlib-ast fallback gates in tests/test_style.py.
lint:
	@command -v ruff >/dev/null 2>&1 && ruff check fourierdiffusion_tpu tests || echo "ruff not installed; skipping"
	@command -v mypy >/dev/null 2>&1 && mypy fourierdiffusion_tpu || echo "mypy not installed; skipping"
	python -m pytest tests/test_style.py -q

bench:
	python bench.py

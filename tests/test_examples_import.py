"""
Every example and paper module imports cleanly (all are __main__-guarded, so
import executes no pricing). Guards the demo surface against API drift.
"""
import importlib
import pathlib

import matplotlib
import pytest

matplotlib.use("Agg")

ROOT = pathlib.Path(__file__).resolve().parents[1]

EXAMPLES = sorted(p.stem for p in (ROOT / "examples").glob("*.py"))
PAPERS = sorted(str(p.relative_to(ROOT))[:-3].replace("/", ".")
                for p in (ROOT / "papers").rglob("*.py"))


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_imports(name):
    importlib.import_module(f"examples.{name}")


@pytest.mark.parametrize("name", PAPERS)
def test_paper_module_imports(name):
    importlib.import_module(name)


@pytest.mark.slow
def test_tpu_fast_paths_example_executes():
    """run_tpu_fast_paths.main() drives every fast-path API end-to-end
    (imports are no-op per the examples contract, so execution coverage
    for the demo lives here)."""
    import examples.run_tpu_fast_paths as demo

    demo.main()

"""The shipped notebooks stay valid: parseable nbformat-4 JSON, every
code cell compiles, and every ``deepgrp_tpu`` import they use resolves
(the notebooks mirror the reference's ``notebooks/DeepGRP.ipynb`` /
``Training.ipynb`` workflows; the executable CI equivalents are
``examples/*.py``)."""

import ast
import importlib
import json
import os

import pytest

NOTEBOOK_DIR = os.path.join(os.path.dirname(__file__), "..", "notebooks")
NOTEBOOKS = ["Training.ipynb", "DeepGRP.ipynb"]


@pytest.mark.parametrize("name", NOTEBOOKS)
def test_notebook_code_cells_compile_and_imports_resolve(name):
    with open(os.path.join(NOTEBOOK_DIR, name)) as fh:
        nb = json.load(fh)
    assert nb["nbformat"] == 4
    code_cells = [c for c in nb["cells"] if c["cell_type"] == "code"]
    assert len(code_cells) >= 4
    for i, cell in enumerate(code_cells):
        src = "".join(cell["source"])
        tree = compile(src, f"{name}[{i}]", "exec", ast.PyCF_ONLY_AST)
        for node in ast.walk(tree):
            if isinstance(node, ast.ImportFrom) and node.module and \
                    node.module.startswith("deepgrp_tpu"):
                mod = importlib.import_module(node.module)
                for alias in node.names:
                    assert hasattr(mod, alias.name), (
                        f"{name}: {node.module}.{alias.name} missing")

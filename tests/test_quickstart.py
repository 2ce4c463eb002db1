"""examples/quickstart.py must run end-to-end against the public API —
the documented five-minute tour can never rot."""

from __future__ import annotations

import importlib.util
import os


def test_quickstart_runs(spark, capsys):
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples",
        "quickstart.py",
    )
    spec = importlib.util.spec_from_file_location("quickstart", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(spark)
    out = capsys.readouterr().out
    assert "BM25 top-3" in out
    assert "Brute-force cosine top-3" in out

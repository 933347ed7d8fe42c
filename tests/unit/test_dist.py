"""The spark-submit distribution artifact (north rule: ``spark-submit
--py-files dist/openie_spark.zip``) must be a self-contained zipimport
package: executors receive ONLY the zip on sys.path, so any module that
imports cleanly from the source tree but not from the zip (missing
sub-package, filesystem-relative data access) breaks on a real cluster
even though every local test passes.

This gate builds the zip the same way ``make dist`` does and imports /
exercises the package in a SUBPROCESS whose sys.path holds the zip and
pyspark's deps but NOT the repo root, mirroring the executor's Python
worker environment."""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]


def build_zip(dst: Path) -> Path:
    zpath = dst / "openie_spark.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((REPO / "openie_spark").rglob("*.py")):
            if "__pycache__" in p.parts:
                continue
            z.write(p, p.relative_to(REPO))
    return zpath


def test_zip_is_selfcontained_for_py_files(tmp_path):
    zpath = build_zip(tmp_path)
    # the subprocess sees the zip INSTEAD of the repo: chdir elsewhere and
    # strip the repo root from every path source
    code = r"""
import sys
sys.path = [p for p in sys.path if not p.rstrip('/').endswith('repo')]
sys.path.insert(0, %r)
import openie_spark  # noqa: F401  package root
# pure-Python executable spec must run from inside the zip (the extract
# UDF imports it ON THE EXECUTOR, where only the zip exists)
from openie_spark.spec.rules import RULESET_VERSION, extract_sentence
triples = extract_sentence("Alice Smith founded Acme Corp in 2001.", 0)
assert triples, "spec extraction returned nothing from zipimport"
# every operator/plan module must at least import (catches filesystem-
# relative resource access and intra-package import bugs)
import pkgutil
import openie_spark as root
bad = []
for m in pkgutil.walk_packages(root.__path__, prefix="openie_spark."):
    try:
        __import__(m.name)
    except Exception as e:  # noqa: BLE001
        bad.append((m.name, repr(e)))
assert not bad, bad
print("ZIPIMPORT-OK", RULESET_VERSION, len(triples))
""" % str(zpath)
    env = dict(os.environ, PYTHONPATH="")
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ZIPIMPORT-OK" in out.stdout

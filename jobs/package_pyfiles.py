#!/usr/bin/env python
"""Build the --py-files zip of the engine package for spark-submit."""

from __future__ import annotations

import os
import sys
import zipfile


def build(out: str = "/tmp/schema_inference_spark.zip") -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "schema_inference_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, repo))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/schema_inference_spark.zip"
    print(build(out))

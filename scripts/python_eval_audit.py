#!/usr/bin/env python
"""Repo-wide stay-JVM-side audit: build every registered query plan and
list the keys containing ANY Python-eval node. The result must stay
exactly the declared Python surface (udf_*/udtf_* contract rows, mm_*
Arrow decode, scan_rowgroup_stats footer reads, llm_compression_filter
zlib) — a new key appearing here means Python leaked into a hot path.
Recorded r7 baseline: 21 keys (SURVEY §6)."""
import io, sys
from contextlib import redirect_stdout
sys.path.insert(0, "/root/repo")
from morphl_model_publishers_churning_users_spark.session import build_session
from morphl_model_publishers_churning_users_spark.registry import get_queries

spark = build_session("py-eval-audit", cpus=16)
SF = "/root/testdata/sf0.001"
hits = {}
errs = {}
for key, fn in get_queries().items():
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            fn(spark, SF).explain("formatted")
        p = buf.getvalue()
        nodes = [n for n in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas",
                             "MapInPandas", "FlatMapCoGroupsInPandas", "WindowInPandas",
                             "AggregateInPandas", "PythonUDTF", "MapInArrow") if n in p]
        if nodes:
            hits[key] = nodes
    except Exception as e:
        errs[key] = str(e)[:80]
print("PYTHON-EVAL KEYS:", len(hits))
for k, v in sorted(hits.items()):
    print(" ", k, v)
print("ERRS:", errs)

"""Registry-wide duplicate-scan plan sweep (verify-skill cadence).

explain("formatted") every registered query at sf0.001 and count
`(N) Scan parquet` blocks per TABLE (from each block's Location line).
A key re-scanning the SAME table gets flagged for hand-triage:
two-branch set ops / disjoint-filter self-joins are fine (a pruned
re-scan beats materializing); an op whose EXPENSIVE derived aggregate
feeds multiple consumers without an eager localCheckpoint is a real
scale bug (round 4: ml_calibration_bins re-derived a per-user
aggregate 4x; llm_perplexity_filter ran its vocab pass twice).

    python scripts/dup_scan_sweep.py [SF_DIR]

Prints one line per flagged key (table -> scan count) and a summary.
Compare flag set against the previous round's (SURVEY §6 logs) — NEW
flags need triage, carried-over ones were already adjudicated.
"""

import io
import re
import sys
import time
import traceback
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from morphl_model_publishers_churning_users_spark import registry, load_all_operators

load_all_operators()

flags, errors = {}, {}
t0 = time.time()
for i, (key, fn) in enumerate(registry.QUERIES.items()):
    try:
        df = fn(spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # count scan blocks per table directory (Location: ...path])
        per_table: dict[str, int] = {}
        # the lazy walk must not cross into the NEXT scan block: a scan
        # printed without a Location line would otherwise merge with its
        # successor and undercount (r12 review)
        blocks = re.findall(
            r"^\(\d+\) Scan parquet[^\n]*\n"
            r"(?:(?!^\(\d+\) Scan parquet).*\n)*?"
            r".*Location:[^\[]*\[([^\]]*)\]",
            plan,
            re.MULTILINE,
        )
        for loc in blocks:
            table = loc.rstrip("/").split("/")[-1].split(",")[0]
            per_table[table] = per_table.get(table, 0) + 1
        dups = {t: n for t, n in per_table.items() if n > 1}
        if dups:
            flags[key] = dups
            print(f"FLAG {key}: {dups}", flush=True)
    except Exception as e:
        errors[key] = repr(e)
        traceback.print_exc()

print(
    f"\nDUP-SCAN SWEEP: {len(registry.QUERIES)} plans, {len(errors)} errors, "
    f"{len(flags)} flagged in {time.time() - t0:.0f}s"
)
if errors:
    for k, e in errors.items():
        print(f"ERROR {k}: {e}")

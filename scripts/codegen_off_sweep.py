"""Full-registry oracle sweep with whole-stage codegen OFF (r8 verdict
item 4): the interpreted-path robustness axis. A real cluster can flip
`spark.sql.codegen.wholeStage=false` (codegen cache pressure, debugging,
JIT bugs) and every expression then runs through the interpreted
eval path — the wire codecs, HOF-heavy array ops, and DECIMAL ladders
are exactly the surfaces that could diverge. AQE is also disabled so
the static plan shape (no runtime re-plan) is exercised at the same
time. Bare driver-shaped session otherwise (non-UTC timezone, no
engine confs — catalog.ensure_confs must do its job at runtime).

Usage: python scripts/codegen_off_sweep.py [SF_DIR] [N] [OFFSET]
"""

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
OFFSET = int(sys.argv[3]) if len(sys.argv) > 3 else 0

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.sql.codegen.wholeStage", "false")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod
from tests.oracle_utils import compare

queries = entrymod.queries()
oracles = entrymod.oracle_sql()

window = list(queries.items())[OFFSET : OFFSET + N]
results = {}
t_all = time.time()
for i, (key, fn) in enumerate(window):
    t0 = time.time()
    try:
        sdf = fn(spark, SF)
        if key in oracles:
            compare(sdf, oracles[key], SF)
            status = "HASH_OK"
        else:
            c = sdf.count()
            status = f"ROWS_OK({c})"
        results[key] = "ok"
    except Exception as e:
        results[key] = f"FAIL: {e}"
        status = "FAIL"
        traceback.print_exc()
    print(
        f"[{i+1:3d}/{len(window)}] {key:36s} {status:14s} {time.time()-t0:6.2f}s",
        flush=True,
    )

fails = {k: v for k, v in results.items() if v != "ok"}
print(f"\nCODEGEN-OFF SWEEP: {len(results)-len(fails)}/{len(results)} green "
      f"in {time.time()-t_all:.0f}s at {SF}")
if fails:
    import json

    print(json.dumps(fails, indent=2))
    sys.exit(1)

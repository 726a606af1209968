"""Round-9 generic bare-session registry sweep.

Runs a window of ``get_queries()`` against the DuckDB oracles in a bare
driver-shaped session (local[8], America/New_York unless TZ overridden,
no engine confs — ``catalog.ensure_confs`` must do its job at runtime),
with arbitrary extra Spark confs from the command line so one harness
covers every robustness axis:

  python scripts/bare_sweep_r9.py SF_DIR [N] [OFFSET] [k=v ...]

Examples (this round's matrix):
  # full registry at driver scale under a fractional-offset timezone
  TZ=Australia/Eucla python scripts/bare_sweep_r9.py /root/testdata/sf0.01 \
      10000 0 spark.sql.session.timeZone=Australia/Eucla
  # Arrow batch-shape independence (1-row batches through every
  # pandas-UDF / mapInPandas path)
  python scripts/bare_sweep_r9.py /root/testdata/sf0.001 10000 0 \
      spark.sql.execution.arrow.maxRecordsPerBatch=1
  # input-split independence (tiny maxPartitionBytes => many splits)
  python scripts/bare_sweep_r9.py /root/testdata/sf0.001 10000 0 \
      spark.sql.files.maxPartitionBytes=65536
"""

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
OFFSET = int(sys.argv[3]) if len(sys.argv) > 3 else 0
EXTRA = dict(a.split("=", 1) for a in sys.argv[4:])

b = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", EXTRA.pop("spark.sql.session.timeZone", "America/New_York"))
    .config("spark.driver.memory", "8g")
)
for k, v in EXTRA.items():
    b = b.config(k, v)
spark = b.getOrCreate()
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
print(f"\nBARE SWEEP ({', '.join(f'{k}={v}' for k, v in EXTRA.items()) or 'no extra confs'}): "
      f"{len(results)-len(fails)}/{len(results)} green in {time.time()-t_all:.0f}s at {SF}")
if fails:
    import json

    print(json.dumps(fails, indent=2))
    sys.exit(1)

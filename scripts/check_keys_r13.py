"""Targeted oracle check: compare specific registry keys in a bare
driver-shaped session (America/New_York, local[8]) at a given SF dir.

Usage: python scripts/check_keys_r13.py SF_DIR key1 key2 ...
"""

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

SF = sys.argv[1]
KEYS = sys.argv[2:]

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod
from tests.oracle_utils import compare

queries = entrymod.queries()
oracles = entrymod.oracle_sql()

fails = []
for key in KEYS:
    t0 = time.time()
    try:
        compare(queries[key](spark, SF), oracles[key], SF)
        status = "HASH_OK"
    except Exception as e:
        fails.append(key)
        status = f"FAIL: {e}"
        traceback.print_exc()
    print(f"{key:32s} {status:14s} {time.time()-t0:6.2f}s", flush=True)

print(f"\n{len(KEYS)-len(fails)}/{len(KEYS)} green")
sys.exit(1 if fails else 0)

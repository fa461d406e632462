#!/usr/bin/env python
"""A/B the AQE plan-string rendering tax (guide §7.3).

Observed during the round-15 suite run: a driver thread with 6.3 CPU-min
in TreeNode.generateTreeString / nodeName -> String.replaceAll ->
Pattern.compile, re-entered on every AdaptiveSparkPlanExec.onUpdatePlan
(each AQE stage materialization posts SparkListenerSQLAdaptiveExecutionUpdate
whose payload embeds qe.explainString(...) over the WHOLE plan — paid even
with the UI disabled, because the string is built before the bus post).

Hypotheses tested here, each on a deliberately reuse-heavy plan (a union
of many filtered copies of one base, so rendering re-walks shared
subtrees):

  A. default                       — baseline
  B. spark.sql.maxPlanStringLength=4096 (static conf) — bounds the string
  C. spark.sql.ui.explainMode=simple — cheaper mode than formatted
  D. B + C

Run:  python tools/plan_string_ab.py [n_copies]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(sys.argv[1]) if len(sys.argv) > 1 else 24


def run_case(tag: str, confs: dict) -> None:
    import subprocess

    code = f"""
import time
from pyspark.sql import SparkSession, functions as F
b = (SparkSession.builder.master("local[32]").appName("psab")
     .config("spark.ui.enabled", "false"))
for k, v in {confs!r}.items():
    b = b.config(k, v)
s = b.getOrCreate()
s.sparkContext.setLogLevel("ERROR")
li = s.read.parquet("{SF_DIR}/lineitem.parquet")
base = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
parts = [base.where(F.col("l_orderkey") % {N} == i) for i in range({N})]
u = parts[0]
for p in parts[1:]:
    u = u.unionByName(p)
out = u.groupBy((F.col("l_orderkey") % 97).alias("k")).agg(F.sum("q").alias("s"))
# warm once
out.write.format("noop").mode("overwrite").save()
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    out.write.format("noop").mode("overwrite").save()
    ts.append(round(time.perf_counter() - t0, 3))
print("{tag}", ts, flush=True)
s.stop()
"""
    subprocess.run([sys.executable, "-c", code], check=False)


if __name__ == "__main__":
    run_case("A_default       ", {})
    run_case("B_maxplanlen4096", {"spark.sql.maxPlanStringLength": "4096"})
    run_case("C_explain_simple", {"spark.sql.ui.explainMode": "simple"})
    run_case(
        "D_both          ",
        {
            "spark.sql.maxPlanStringLength": "4096",
            "spark.sql.ui.explainMode": "simple",
        },
    )

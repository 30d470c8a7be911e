"""Executed-plan audit over the slowest bench queries: run each
query once and report parquet-scan / ReusedExchange / join-strategy /
Python-eval counts from the AQE-final plan — the round-16 instrument
that surfaced the band-join broadcast-recompute trap (duplicate
signature lineages under BroadcastHashJoin self-joins).

Usage: python scripts/scan_audit.py  (expects a baseline
BENCH_FULL-style json at /tmp/BENCH_FULL_r16_baseline.json, else
edit the path)."""
import sys, json, re
sys.path.insert(0, '/root/repo')
from mapreduce_chisquare_spark.plans.registry import REGISTRY
from mapreduce_chisquare_spark.session import get_spark
spark = get_spark('scan_audit')
base = json.load(open('/tmp/BENCH_FULL_r16_baseline.json'))['queries']
names = [n for n,_ in sorted(base.items(), key=lambda kv:-kv[1])[:45]]
for name in names:
    try:
        df = REGISTRY[name][0](spark, '/root/testdata/sf0.1')
        df.collect()
        p = df._jdf.queryExecution().executedPlan().toString().split('== Initial Plan ==')[0]
        print(f"{name}\tt={base[name]}\tscans={p.count('Scan parquet')}\treuse={p.count('ReusedExchange')}\tBHJ={p.count('BroadcastHashJoin')}\tSMJ={p.count('SortMergeJoin')}\tpy={p.count('EvalPython')+p.count('MapInPandas')+p.count('ArrowEval')}", flush=True)
    except Exception as e:
        print(f"{name}\tERROR {str(e)[:80]}", flush=True)

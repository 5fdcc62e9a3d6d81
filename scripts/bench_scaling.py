"""Two-cluster-size scaling protocol (BASELINE.md): run the identical
CDC apply job at local[8] and local[32] (shuffle partitions scaled
with cores) on the SAME pre-generated journal, report events/sec at
both and efficiency = (throughput_32 / throughput_8) / 4.

Each parallelism level runs in its own subprocess (fresh JVM, own
cwd) so JVM sizing and Derby locks can't interfere.

Usage: python scripts/bench_scaling.py [n_ops] [out_md]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["IBMI_REPO"])
from debezium_connector_ibmi_spark.config import EngineConfig
from debezium_connector_ibmi_spark.session import get_spark
from debezium_connector_ibmi_spark.streaming.engine import JournalTailer

cpus = int(os.environ["IBMI_CPUS"])
journal = os.environ["IBMI_JOURNAL"]
target = os.environ["IBMI_TARGET"]
n_batches = int(os.environ.get("IBMI_BATCHES", "4"))
total_span = int(os.environ["IBMI_SPAN"])

spark = get_spark(app_name=f"scale-{cpus}", cores=cpus, shuffle_partitions=cpus)
cfg = EngineConfig(
    journal_path=journal, target_path=target,
    max_entries_per_batch=total_span // n_batches + 1,
    num_buckets=32, salt_buckets=8,
)
tailer = JournalTailer(spark, cfg)
t0 = time.time()
stats = tailer.run_to_head()
wall = time.time() - t0
events = sum(s.get("events", 0) for s in stats)
print(json.dumps({"cpus": cpus, "wall_sec": wall, "events": events,
                  "events_per_sec": events / wall, "batches": len(stats)}))
"""


def run_level(cpus: int, journal: str, span: int, workdir: str) -> dict:
    env = {
        **os.environ,
        "IBMI_REPO": REPO,
        "IBMI_CPUS": str(cpus),
        "IBMI_JOURNAL": journal,
        "IBMI_TARGET": f"{workdir}/target_{cpus}",
        "IBMI_SPAN": str(span),
        "SPARK_GRAFT_DRIVER_MEM": "24g",
    }
    cwd = f"{workdir}/cwd_{cpus}"
    os.makedirs(cwd, exist_ok=True)
    out = subprocess.run(
        [sys.executable, "-c", WORKER],
        env=env,
        cwd=cwd,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    n_ops = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out_md = sys.argv[2] if len(sys.argv) > 2 else None

    work = tempfile.mkdtemp(prefix="ibmi_scaling_")
    # generate once, in its own subprocess
    gen_code = f"""
import sys, os
sys.path.insert(0, {REPO!r})
from debezium_connector_ibmi_spark.datagen.journal import JournalGenConfig, write_journal
from debezium_connector_ibmi_spark.session import get_spark
spark = get_spark(cores=32, shuffle_partitions=32)
gen = JournalGenConfig(n_urls={n_ops}//20, n_ops={n_ops}, txn_size=500,
                       receiver_rotation={n_ops}//8, skew=2.0)
write_journal(spark, gen, {work!r} + "/journal", num_files=64)
"""
    gcwd = f"{work}/cwd_gen"
    os.makedirs(gcwd, exist_ok=True)
    subprocess.run(
        [sys.executable, "-c", gen_code], check=True, cwd=gcwd,
        capture_output=True, text=True, timeout=3600,
    )
    span = n_ops * 6  # seq slots per op

    r8 = run_level(8, f"{work}/journal", span, work)
    r32 = run_level(32, f"{work}/journal", span, work)
    eff = (r32["events_per_sec"] / r8["events_per_sec"]) / 4.0
    result = {
        "n_ops": n_ops,
        "local8": r8,
        "local32": r32,
        "scaling_efficiency_8_to_32": round(eff, 3),
    }
    print(json.dumps(result))
    if out_md:
        with open(out_md, "a") as fh:
            fh.write(
                f"\n## Scaling run (n_ops={n_ops})\n\n"
                f"| level | wall s | events | events/s |\n|---|---|---|---|\n"
                f"| local[8]  | {r8['wall_sec']:.1f} | {r8['events']} |"
                f" {r8['events_per_sec']:.0f} |\n"
                f"| local[32] | {r32['wall_sec']:.1f} | {r32['events']} |"
                f" {r32['events_per_sec']:.0f} |\n\n"
                f"efficiency (T32/T8)/4 = **{eff:.3f}**\n"
            )


if __name__ == "__main__":
    main()

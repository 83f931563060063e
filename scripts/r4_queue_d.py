"""Round-4 TPU queue D: scale-out + remaining measurements.

  1. ala2 GNN redo (real GNN conditioner + de-whitened geometry)
  2. ALA4 with the winning --tcond recipe: data, umbrella, train, eval,
     science (the chain-length scaling curve, VERDICT r3 item 4)
  3. LJ13 sharpen attempt: longer retrain (24k iters) + eval
  4. bench.py (honest roofline) + bench_scaling real-chip n=1 anchor

Run:  python scripts/r4_queue_d.py [--skip=1,2,...]
"""
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label, args, timeout=7200, out=None):
    t0 = time.time()
    print(f"[queueD {time.strftime('%H:%M:%S')}] START {label}", flush=True)
    try:
        if out:
            with open(os.path.join(ROOT, out), "w") as fh:
                rc = subprocess.call([sys.executable] + args, cwd=ROOT,
                                     timeout=timeout, stdout=fh,
                                     stderr=subprocess.STDOUT)
        else:
            rc = subprocess.call([sys.executable] + args, cwd=ROOT, timeout=timeout)
    except subprocess.TimeoutExpired:
        rc = -1
    print(f"[queueD {time.strftime('%H:%M:%S')}] END {label} rc={rc} "
          f"({time.time()-t0:.0f}s)", flush=True)
    return rc


def main():
    skip = set()
    for a in sys.argv[1:]:
        if a.startswith("--skip="):
            skip = set(a.split("=", 1)[1].split(","))

    if "1" not in skip:
        run("gnn train", ["scripts/ala2_gnn.py", "train"])
        run("gnn eval", ["scripts/ala2_gnn.py", "eval"])
    if "2" not in skip:
        run("ala4 data+umbrella", ["scripts/r4_gbsa_campaign.py", "4",
                                   "--stages=data,umbrella"])
        run("ala4 tcond train", ["scripts/polyala_demo.py", "train", "4",
                                 "--gbsa", "--tcond", "--iters=16000"])
        run("ala4 tcond eval", ["scripts/polyala_demo.py", "eval", "4",
                                "--gbsa", "--tcond"])
        run("ala4 tcond science", ["scripts/polyala_science.py", "4",
                                   "--gbsa", "--tcond"])
    if "3" not in skip:
        run("lj13 retrain 24k", ["scripts/lj13_science.py", "train",
                                 "--iters=24000"])
        run("lj13 eval", ["scripts/lj13_science.py", "eval"])
    if "4" not in skip:
        run("bench", ["bench.py"], out="artifacts/r4_bench_log.txt")
        run("bench_scaling tpu n=1", ["bench_scaling.py"],
            out="artifacts/r4_scaling_tpu.jsonl")
    print("[queueD] done", flush=True)


if __name__ == "__main__":
    main()

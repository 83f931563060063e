"""Round-4 TPU queue C: stack rungs on the winning --tcond GBSA recipe.

  1. equilibration arbiter (ladder-cold vs neutra pools, plain HMC)
  2. combined --tcond --neutra train + eval + science
  3. log-variance finetune of the better of {tcond, tcond+neutra} is left
     to the operator (finetune needs the winner's tag) — this queue runs
     the tempered/transfer sweeps on the plain tcond checkpoint instead.

Run:  python scripts/r4_queue_c.py
"""
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label, args, timeout=7200):
    t0 = time.time()
    print(f"[queueC {time.strftime('%H:%M:%S')}] START {label}", flush=True)
    try:
        rc = subprocess.call([sys.executable] + args, cwd=ROOT, timeout=timeout)
    except subprocess.TimeoutExpired:
        rc = -1
    print(f"[queueC {time.strftime('%H:%M:%S')}] END {label} rc={rc} "
          f"({time.time()-t0:.0f}s)", flush=True)
    return rc


def main():
    run("arbiter", ["scripts/r4_equil_arbiter.py", "3", "--iters=2000"])
    run("nt+tc train", ["scripts/polyala_demo.py", "train", "3",
                        "--gbsa", "--tcond", "--neutra", "--iters=16000"])
    run("nt+tc eval", ["scripts/polyala_demo.py", "eval", "3",
                       "--gbsa", "--tcond", "--neutra"])
    run("nt+tc science", ["scripts/polyala_science.py", "3",
                          "--gbsa", "--tcond", "--neutra"])
    run("tc lv finetune", ["scripts/polyala_demo.py", "finetune", "3",
                           "--gbsa", "--tcond", "--iters=4000"])
    run("tc lv eval", ["scripts/polyala_demo.py", "eval", "3",
                       "--gbsa", "--tcond", "--lv"])
    print("[queueC] done", flush=True)


if __name__ == "__main__":
    main()

"""Round-4 TPU queue B: runs after the GBSA campaign frees the chip.

  A. GBSA ALA3 --tcond: temperature-conditioned train on all rungs
     + eval + science + tempered/transfer sweeps
  B. LJ13: log-variance finetune + eval + flow-perturbation sigma sweep
  C. ala2 GNN-conditioned flagship: data (if missing) + train + eval

Each stage is independent; a failure logs and moves on.
Run:  python scripts/r4_queue_b.py [--skip=A,B,...]
"""
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label, args, timeout=7200):
    t0 = time.time()
    print(f"[queueB {time.strftime('%H:%M:%S')}] START {label}: {' '.join(args)}",
          flush=True)
    try:
        rc = subprocess.call([sys.executable] + args, cwd=ROOT, timeout=timeout)
    except subprocess.TimeoutExpired:
        rc = -1
        print(f"[queueB] {label} TIMED OUT after {timeout}s", flush=True)
    print(f"[queueB {time.strftime('%H:%M:%S')}] END {label} rc={rc} "
          f"({time.time()-t0:.0f}s)", flush=True)
    return rc


def main():
    skip = set()
    for a in sys.argv[1:]:
        if a.startswith("--skip="):
            skip = set(a.split("=", 1)[1].split(","))

    if "A" not in skip:
        run("A1 tcond train", ["scripts/polyala_demo.py", "train", "3",
                               "--gbsa", "--tcond", "--iters=16000"])
        run("A2 tcond eval", ["scripts/polyala_demo.py", "eval", "3",
                              "--gbsa", "--tcond"])
        run("A3 tcond science", ["scripts/polyala_science.py", "3",
                                 "--gbsa", "--tcond"])
        run("A4 tempered sweeps", ["scripts/r4_tempered_eval.py", "3", "--gbsa"])
    if "B" not in skip:
        run("B1 lj13 finetune", ["scripts/lj13_science.py", "finetune"])
        run("B2 lj13 eval_lv", ["scripts/lj13_science.py", "eval_lv"])
        run("B3 lj13 perturb", ["scripts/lj13_science.py", "perturb"])
        run("B4 lj13 perturb lv", ["scripts/lj13_science.py", "perturb", "--lv"])
    if "C" not in skip:
        run("C1 ala2 gnn", ["scripts/ala2_gnn.py", "all"])
    print("[queueB] done", flush=True)


if __name__ == "__main__":
    main()

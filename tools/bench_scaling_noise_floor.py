"""N independent pure-Python digest builds (no Spark, no IO): data is
generated in-process, so the ONLY shared resource is CPU+memory.  If this
scales ~linearly while the Spark job does not, the Spark job's loss is
the shared scan/Arrow subsystem of one box, not the library."""
import sys, os, time, json, subprocess, tempfile, glob

def worker(idx, barrier_dir, rows):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import numpy as np
    from tdigest_spark.core import MergingDigest
    rng = np.random.default_rng(idx)
    vals = rng.uniform(0, 1, rows)
    d = MergingDigest(100); d.add(vals[:100000])  # warm
    open(os.path.join(barrier_dir, f"ready_{idx}"), "w").close()
    go = os.path.join(barrier_dir, "go")
    while not os.path.exists(go):
        time.sleep(0.05)
    t0 = time.perf_counter()
    d2 = MergingDigest(100)
    for lo in range(0, rows, 10000):
        d2.add(vals[lo:lo+10000])
    print(json.dumps({"idx": idx, "sec": time.perf_counter()-t0}), flush=True)

def level(n, rows_per_proc):
    bd = tempfile.mkdtemp(prefix=f"pure_{n}_")
    procs = [subprocess.Popen([sys.executable, __file__, "--worker", str(i), bd, str(rows_per_proc)],
                              stdout=subprocess.PIPE, text=True) for i in range(n)]
    while len(glob.glob(os.path.join(bd, "ready_*"))) < n:
        time.sleep(0.05)
    open(os.path.join(bd, "go"), "w").close()
    walls = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        walls.append(json.loads([l for l in out.splitlines() if l.startswith("{")][-1])["sec"])
    wall = max(walls)
    return n * rows_per_proc / wall

if __name__ == "__main__":
    if sys.argv[1:2] == ["--worker"]:
        worker(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]))
    else:
        rows = 40_000_000
        for trial in range(2):
            r2 = level(2, rows)
            r8 = level(8, rows)
            print(json.dumps({"trial": trial, "rows_per_proc": rows,
                              "agg_rows_per_sec": {"2": round(r2), "8": round(r8)},
                              "efficiency_2_to_8": round(r8 / r2 / 4, 3)}), flush=True)

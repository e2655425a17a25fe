"""Host CPU-delivery calibration: fixed work per process, perfect
parallelism expected. Reports per-proc wall inflation vs 1 proc."""
import multiprocessing as mp, time, json
import numpy as np

def burn(_):
    a = np.random.RandomState(0).rand(200_000)
    s = 0.0
    t0 = time.monotonic()
    for _ in range(400):
        s += float(np.sin(a).sum())
    return time.monotonic() - t0

out = {}
for n in (1, 2, 4, 8, 16, 32):
    walls = []
    for rep in range(3):
        with mp.Pool(n) as p:
            times = p.map(burn, range(n))
        walls.append(max(times))
    w = sorted(walls)[1]
    out[n] = round(w, 3)
base = out[1]
print(json.dumps({
    "fixed_work_wall_s_by_nproc": out,
    "per_proc_inflation_vs_1": {n: round(v/base, 2) for n, v in out.items()},
    "effective_core_equivalents": {n: round(n*base/v, 1) for n, v in out.items()},
}))

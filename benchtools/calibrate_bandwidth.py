"""Same calibration but with a STREAMING working set (50 MB per proc,
thrashes LLC) — models Arrow batch + kernel memory traffic."""
import multiprocessing as mp, time, json
import numpy as np

def burn(_):
    a = np.random.RandomState(0).rand(6_250_000)  # 50 MB
    t0 = time.monotonic()
    s = 0.0
    for _ in range(40):
        s += float((a * 1.0001 + 0.5).sum())
    return time.monotonic() - t0

out = {}
for n in (1, 4, 8, 16, 32):
    walls = []
    for rep in range(3):
        with mp.Pool(n) as p:
            times = p.map(burn, range(n))
        walls.append(max(times))
    out[n] = round(sorted(walls)[1], 3)
base = out[1]
print(json.dumps({
    "stream_wall_s_by_nproc": out,
    "effective_core_equivalents": {n: round(n*base/v, 1) for n, v in out.items()},
}))

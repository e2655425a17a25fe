"""Usage: python benchtools/parse_eventlog.py <spark.eventLog.dir>"""
import json, glob, io, sys
import pyarrow as pa
d = sorted(glob.glob(sys.argv[1] + "/*"))[-1]
files = sorted(glob.glob(d + "/events_*"))
stages = {}
task_time = 0.0
for fp in files:
    stream = pa.CompressedInputStream(pa.OSFile(fp, "rb"), "zstd")
    data = stream.read()
    for line in io.TextIOWrapper(io.BytesIO(data), encoding="utf-8", errors="replace"):
        try: e = json.loads(line)
        except: continue
        ev = e.get("Event")
        if ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            sub = si.get("Submission Time"); comp = si.get("Completion Time")
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"].split("\n")[0][:50],
                "tasks": si["Number of Tasks"],
                "wall": (comp - sub)/1000 if sub and comp else None,
            }
        elif ev == "SparkListenerTaskEnd":
            ti = e.get("Task Info", {})
            task_time += (ti.get("Finish Time",0) - ti.get("Launch Time",0))/1000
tot = sum(s["wall"] for s in stages.values() if s["wall"])
print(f"{sys.argv[1]}: sum stage walls {tot:.1f}s  total task-time {task_time:.1f} core-s  n_stages {len(stages)}")
for sid, s in sorted(stages.items(), key=lambda kv: -(kv[1]["wall"] or 0))[:8]:
    print(f"  stage {sid:3d} {s['wall']:7.1f}s  tasks={s['tasks']:4d}  {s['name']}")

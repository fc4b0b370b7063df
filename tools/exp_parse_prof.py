import glob, gzip, json, sys
from collections import defaultdict
def agg(tdir):
    path = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))[-1]
    ev = json.loads(gzip.open(path).read()).get("traceEvents", [])
    d = defaultdict(lambda: [0.0, 0])
    for e in ev:
        if e.get("ph") == "X" and e.get("dur"):
            d[e.get("name", "")][0] += e["dur"]
            d[e.get("name", "")][1] += 1
    return d
for tdir in ("/tmp/prof_enc_off", "/tmp/prof_enc_on"):
    d = agg(tdir)
    print(f"== {tdir}")
    for name, (dur, cnt) in sorted(d.items(), key=lambda x: -x[1][0])[:40]:
        if any(s in name for s in ("while", "block_until", "try_to", "trace",
                                   "__exit__", "stop_trace", "jit_", "$")):
            continue
        print(f"  {dur/1e3:9.2f} ms x{cnt:5d}  {name[:95]}")

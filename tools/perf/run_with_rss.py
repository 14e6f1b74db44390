#!/usr/bin/env python
"""Run a command, sampling its host RSS once a second; print peak and
a per-iteration growth estimate (linear fit over the samples)."""
import os, subprocess, sys, time

cmd = sys.argv[1:]
proc = subprocess.Popen(cmd)
samples = []  # (t, rss_bytes)
try:
    while proc.poll() is None:
        try:
            with open(f"/proc/{proc.pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        samples.append((time.time(), int(line.split()[1]) * 1024))
                        break
        except FileNotFoundError:
            break
        time.sleep(1.0)
finally:
    rc = proc.wait()
if len(samples) >= 10:
    t0, r0 = samples[0]
    ts = [t - t0 for t, _ in samples]
    rs = [r - r0 for _, r in samples]
    n = len(ts)
    mt, mr = sum(ts) / n, sum(rs) / n
    slope = sum((a - mt) * (b - mr) for a, b in zip(ts, rs)) / max(
        sum((a - mt) ** 2 for a in ts), 1e-9)
    print(f"RSS: start={r0/1e6:.0f}MB peak={max(r for _,r in samples)/1e6:.0f}MB "
          f"growth={slope/1e6:.2f}MB/s over {ts[-1]:.0f}s", flush=True)
print(f"WRAPPED_EXIT={rc}", flush=True)
sys.exit(rc)

"""Process-group CPU accounting (/proc) — the stall-vs-work instrument.

Wall-clock alone cannot distinguish "this stage stopped scaling because its
work serialized" from "because the host ran out of memory bandwidth / page
faulted": both show sub-linear speedup. CPU-seconds across the whole process
group (driver + py4j-launched JVM + its forked python workers, which all
share the pgid) separates them:

- equal CPU at both parallelism levels + sub-linear wall → the extra threads
  waited OFF-cpu (scheduling floors, page-fault/IO, sleeping locks); the job
  did the same work;
- inflated CPU at the higher level → the extra threads spent ON-cpu cycles
  not advancing the job: spin, spill re-work, oversubscription — or
  DRAM-stall cycles, since a memory-bandwidth-stalled thread still accrues
  utime. On a single socket, CPU inflation that appears only at the higher
  thread count and only in memory-traffic-heavy stages is the signature of
  shared-bandwidth contention (the 400k v3 study: L2-blocked signatures
  scale 3.97× with flat CPU; shuffle/numpy-heavy candidates+verify inflate
  ~2× — a real cluster adds a socket with every executor).

``RUSAGE_CHILDREN`` cannot provide this: the JVM is a grandchild the python
process never waits on, so its rusage never rolls up (measured in the r5
200k study, whose CPU column silently counted only the python driver).

Caveat: CPU of processes that exited between two samples is not seen. The
JVM and (reused) python workers live across any window worth measuring, so
deltas are floors within a few percent.
"""

from __future__ import annotations

import os


def proc_group_cpu() -> "float | None":
    """CPU-seconds (utime+stime) of every LIVE process in this process group.

    Returns None where /proc or sysconf is unavailable (non-Linux)."""
    try:
        pgid = os.getpgid(0)
        hz = os.sysconf("SC_CLK_TCK")
    except (OSError, ValueError):
        return None
    total_ticks = 0
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat", "rb") as f:
                st = f.read().decode("ascii", "replace")
            # fields after the parenthesized comm (which may contain spaces)
            rest = st.rsplit(")", 1)[1].split()
            # rest[2] = pgrp, rest[11] = utime, rest[12] = stime
            if int(rest[2]) != pgid:
                continue
            total_ticks += int(rest[11]) + int(rest[12])
        except (OSError, IndexError, ValueError):
            continue  # raced with process exit
    return total_ticks / hz

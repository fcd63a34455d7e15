"""Parse a Spark rolling event log dir into a per-job breakdown.

Usage: python tools/parse_eventlog.py /tmp/spark-events/eventlog_v2_<app> [desc-filter]
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    d = sys.argv[1]
    filt = sys.argv[2] if len(sys.argv) > 2 else None
    parts = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.startswith("events_")
    ) if os.path.isdir(d) else [d]
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    import io

    import pyarrow as pa

    def _open(p):
        if p.endswith(".zstd"):
            return io.TextIOWrapper(
                io.BufferedReader(pa.input_stream(p, compression="zstd"))
            )
        return open(p)

    for p in parts:
        with _open(p) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    props = ev.get("Properties") or {}
                    jobs[jid] = {
                        "start": ev["Submission Time"],
                        "desc": props.get("spark.job.description", ""),
                        "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    }
                elif e == "SparkListenerJobEnd":
                    if ev["Job ID"] in jobs:
                        jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    st = stages.setdefault(si["Stage ID"], {})
                    st.update(
                        name=si["Stage Name"],
                        tasks=si["Number of Tasks"],
                        submit=si.get("Submission Time"),
                        complete=si.get("Completion Time"),
                    )
                elif e == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    m = ev.get("Task Metrics") or {}
                    st = stages.setdefault(sid, {})
                    st["run_ms"] = st.get("run_ms", 0) + m.get("Executor Run Time", 0)
                    st["gc_ms"] = st.get("gc_ms", 0) + m.get("JVM GC Time", 0)
                    srm = m.get("Shuffle Read Metrics") or {}
                    st["sh_read"] = (
                        st.get("sh_read", 0)
                        + srm.get("Remote Bytes Read", 0)
                        + srm.get("Local Bytes Read", 0)
                    )
                    swm = m.get("Shuffle Write Metrics") or {}
                    st["sh_write"] = st.get("sh_write", 0) + swm.get(
                        "Shuffle Bytes Written", 0
                    )

    sel = [
        (jid, j)
        for jid, j in jobs.items()
        if "end" in j and (filt is None or filt in j.get("desc", ""))
    ]
    sel.sort(key=lambda x: x[1]["start"])
    prev_end = None
    job_sum = gap_sum = 0.0
    for jid, j in sel:
        dur = (j["end"] - j["start"]) / 1000.0
        gap = (j["start"] - prev_end) / 1000.0 if prev_end else 0.0
        prev_end = j["end"]
        job_sum += dur
        gap_sum += max(gap, 0)
        sids = [s for s in j["stages"] if s in stages and stages[s].get("complete")]
        stg = []
        for s in sorted(sids):
            st = stages[s]
            nm = (st.get("name") or "?").split(" at ")[0]
            stg.append(
                f"{nm}[{st.get('tasks', '?')}t {st.get('run_ms', 0)}ms "
                f"{st.get('sh_read', 0) // 1024}KBr]"
            )
        print(
            f"job {jid}: {dur:7.3f}s gap={gap:6.3f}s "
            f"nstage={len(sids)} {' | '.join(stg[:8])}"
        )
    print(f"TOTAL job {job_sum:.3f}s gaps {gap_sum:.3f}s n_jobs={len(sel)}")


if __name__ == "__main__":
    main()

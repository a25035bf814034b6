#!/usr/bin/env python3
"""Merge MemProbe normal/tight runs into a MEMPROBE_r{N} artifact.

Usage: merge_memprobe.py out.json note normal.json tight.json [x10_normal.json x10_tight.json ...]
Pairs of (normal, tight) JSONs are merged; each pair's queries are suffixed
into the same top-level "queries" map (later pairs may re-probe single
queries at a different scale — their rows carry the pair's "data" dir so
scales stay distinguishable).
"""
import json
import sys


def main() -> None:
    out, note = sys.argv[1], sys.argv[2]
    pairs = list(zip(sys.argv[3::2], sys.argv[4::2]))
    queries = {}
    meta = []
    for i, (npath, tpath) in enumerate(pairs):
        normal = json.load(open(npath))
        tight = json.load(open(tpath))
        meta.append({
            "data": normal["data"],
            "normal": {"heap": normal["heap"], "cores": normal["cores"]},
            "tight": {"heap": tight["heap"], "cores": tight["cores"],
                      "fraction": 0.2},
        })
        for name, nrow in normal["queries"].items():
            trow = tight["queries"].get(name)
            if trow is None:
                continue
            # pair index in the fallback key: a name+data collision across
            # three or more pairs would otherwise silently overwrite a row
            key = name if name not in queries \
                else f"{name}@{normal['data']}#{i}"
            if key in queries:
                raise SystemExit(f"duplicate merged key {key}")
            queries[key] = {
                "data": normal["data"],
                "hash_match": (not nrow.get("error")) and (not trow.get("error"))
                              and nrow["hash"] == trow["hash"],
                "oom": bool(nrow.get("oom") or trow.get("oom")),
                "error": bool(nrow.get("error") or trow.get("error")),
                "normal_sec": nrow["sec"],
                "tight_sec": trow["sec"],
                "tight_spill_mem_mb": trow.get("spill_mem_mb"),
                "tight_spill_disk_mb": trow.get("spill_disk_mb"),
                "tight_peak_exec_mb": trow.get("peak_exec_mb"),
                "normal_gc_sec": nrow.get("gc_sec"),
                "tight_gc_sec": trow.get("gc_sec"),
            }
    summary = {
        "queries": len(queries),
        "hash_matches": sum(1 for q in queries.values() if q["hash_match"]),
        "tight_queries_spilling": sum(
            1 for q in queries.values()
            if (q["tight_spill_mem_mb"] or 0) > 0),
        "ooms": sum(1 for q in queries.values() if q["oom"]),
        "errors": sum(1 for q in queries.values() if q["error"]),
    }
    summary["all_green"] = (summary["hash_matches"] == summary["queries"]
                            and summary["ooms"] == 0
                            and summary["errors"] == 0)
    doc = {"probe": "memory-pressure", "runs": meta, "note": note,
           "summary": summary, "queries": queries}
    json.dump(doc, open(out, "w"), indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

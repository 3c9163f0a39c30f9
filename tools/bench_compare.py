#!/usr/bin/env python3
"""Compare two graft Bench JSON recordings with box-speed normalization.

Raw totals from different sessions/boxes are not comparable: r8 and r9
both observed UNIFORM 1.2-1.7x inflations with byte-identical code
(virtualized CPU variance). This tool estimates the box factor as the
median new/old ratio over a CANARY set of trivial, dependency-free
queries (scalar/window ops that no engine change plausibly touches),
divides it out, and reports only residual per-query regressions.

Per-query statistic (r15): the MIN over the recording's per-pass run
list, not the median. Every flag of r13 and r14 had the same signature
— an alphabetically-contiguous block with TWO of three interleaved
passes inflated by a transient box window and one pass at exact
historical steady state; a 3-sample median lands on a disturbed pass,
and each flag re-timed in isolation to that clean pass's value. The
canaries are FLAT across passes in those recordings (verified on the
r14 artifact), so per-pass canary normalization cannot repair a
block-local window — but the min can: disturbance only ever ADDS time,
so the fastest sample is the one the box could not have inflated, and
a REAL plan regression inflates every pass, min included. Recordings
without a "runs" field fall back to the recorded median.

Usage: python3 tools/bench_compare.py OLD.json NEW.json [threshold]
Exit 1 if any query regresses more than threshold (default 1.5x) after
normalization.
"""
import json
import re
import statistics
import sys

CANARIES = [
    "scalar_string", "scalar_string2", "scalar_date", "scalar_math",
    "case_buckets", "window_running", "window_lag_gap", "window_lead_next",
    "set_ops", "value_hist", "hourly_profile", "map_funcs",
]

# The graded streaming queries co-schedule as families (StreamGrade
# .families): the first-invoked member bills the family's wall-clock and
# siblings bill ~0, so the billing query CHANGES whenever the catalog
# gains an alphabetically-earlier member. Compare each family as ONE
# summed entry — member-level ratios are attribution noise, the summed
# wall-clock is the real signal. The member → family map is read from
# the recording's own "families" field (Bench emits StreamGrade's
# billing map); recordings predating that field fall back to the name
# pattern, folded as one pooled family.
STREAM_MEMBER = re.compile(r"^(cdc|doc|emb|mm)_stream_")


def fold_stream_family(rec, use_runs=True):
    queries = rec["queries"]
    # min-of-passes is only a fair comparison statistic when BOTH
    # recordings carry per-pass runs; a min-vs-median pair biases every
    # ratio downward by the runs-less side's noise spread and can mask
    # a real regression just under threshold — so the caller decides
    # per recording PAIR, and a mixed pair degrades both sides to the
    # recorded headline value
    runs = (rec.get("runs") or {}) if use_runs else {}

    def stat(q):
        ts = runs.get(q)
        return min(ts) if ts else queries[q]

    fams = rec.get("families")
    if fams:
        folded = {q: stat(q) for q in queries if q not in fams}
        sums = {}
        for q in queries:
            if q in fams:
                sums[fams[q]] = sums.get(fams[q], 0.0) + stat(q)
        for f, t in sums.items():
            folded[f"family[{f}]"] = t
    else:
        folded = {q: stat(q) for q in queries if not STREAM_MEMBER.match(q)}
        fam = [stat(q) for q in queries if STREAM_MEMBER.match(q)]
        if fam:
            folded["stream_family[sum]"] = sum(fam)
    return folded


def main(old_path, new_path, threshold=1.5):
    old_rec, new_rec = json.load(open(old_path)), json.load(open(new_path))
    # driver-side BENCH_r{N}.json wraps the Bench record under "parsed"
    old_rec = old_rec.get("parsed", old_rec)
    new_rec = new_rec.get("parsed", new_rec)
    # per-id family folds only compare when BOTH recordings carry the
    # map; a mixed pair degrades to the pooled pattern fold on each side
    if ("families" in old_rec) != ("families" in new_rec):
        old_rec.pop("families", None)
        new_rec.pop("families", None)
    both_runs = bool(old_rec.get("runs")) and bool(new_rec.get("runs"))
    old = fold_stream_family(old_rec, use_runs=both_runs)
    new = fold_stream_family(new_rec, use_runs=both_runs)
    canary = [new[q] / old[q] for q in CANARIES
              if q in old and q in new and old[q] > 0.02]
    box = statistics.median(canary) if len(canary) >= 3 else 1.0
    print(f"box factor (median over {len(canary)} canaries): {box:.2f}x")
    shared = [q for q in new if q in old and old[q] > 0.05]
    resid = sorted(((new[q] / old[q] / box, q) for q in shared), reverse=True)
    # a regression must be BOTH relative (>threshold after normalization)
    # and absolute (>0.25s of normalized cost): sub-second queries show
    # up to 5x per-sample spread (documented box variance), and a 1.6x
    # ratio on a 0.2s query is jitter, not a plan change — verified by
    # isolated re-measurement whenever flagged
    min_abs = 0.25
    bad = [(r, q) for r, q in resid
           if r > threshold and new[q] - box * old[q] > min_abs]
    print(f"{len(shared)} shared queries; "
          f"median residual {statistics.median(r for r, _ in resid):.2f}x")
    badset = {q for _, q in bad}
    for r, q in resid[:10]:
        flag = (" <-- REGRESSION" if q in badset
                else " (jitter-floor)" if r > threshold else "")
        print(f"  {r:5.2f}x  {old[q]:6.2f} -> {new[q]:6.2f}  {q}{flag}")
    added = sorted(set(new) - set(old))
    if added:
        print(f"new queries ({len(added)}): " + ", ".join(added[:12]) +
              (" ..." if len(added) > 12 else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    import signal
    signal.signal(signal.SIGPIPE, signal.SIG_DFL)  # clean exit under | head
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], t))

"""Regenerate PARITY.md's performance table from a run_all.py artifact.

Usage: python tools/parity_table.py [benchmarks/results_r05.json]

Prints the markdown table between PARITY.md's ``<!-- perf-table -->``
markers so the published numbers are ALWAYS the committed artifact's —
never prose drift (VERDICT r4 weak #6). With --write, splices the table
into PARITY.md in place.
"""

from __future__ import annotations

import json
import sys

#: config key -> (row label, target column)
ROWS = [
    ("headline_128trk_bounce_rtf",
     "headline: 128-track 48 kHz bounce (`bench.py`)", "≥100×"),
    ("config1_8trk_mix_rtf", "config 1: 8-track stereo mix", "—"),
    ("config2_32trk_automation_fades_rtf",
     "config 2: 32 tracks + sample-accurate automation + fades (lanes "
     "evaluate inside the Pallas mix kernel)", "—"),
    ("config3_sinc_resampling_128trk_rtf",
     "config 3: clip-rate **sinc** resampling 44.1k→48k, 128 tracks "
     "(MXU run prerendering, exact Kaiser-sinc phases)", "—"),
    ("extra_config3_linear_128trk_rtf",
     "config 3 under linear interpolation (slow-path kernel)", "—"),
    ("config4_peaks_gsamples_per_s",
     "config 4: peak mipmaps, 1 h audio", "≥1 Gs/s"),
    ("config5_128trk_eq_master_rtf",
     "config 5: 128 tracks × 3-band EQ + master bus (spectral-sum FIR)",
     "—"),
    ("config6_routed_sidechain_128trk_rtf",
     "config 6: 128 tracks → 8 buses with chains + sidechain ducking + "
     "master (routed finisher)", "—"),
    ("config7_tempo_mapped_128trk_rtf",
     "config 7: 128 tracks under a piecewise tempo map (step + linear "
     "ramp) + fader lanes", "—"),
    ("config8_preview_duty",
     "config 8: PreviewStream steady-state per-block duty cycle "
     "(512-frame blocks vs the reference's 10.67 ms budget, "
     "timing.h:54-67)", "<100%"),
    ("extra_sinc_irrational_128trk_rtf",
     "extra: 128 tracks at IRRATIONAL speeds (semitone/golden ratio) via "
     "the adaptive-convergent Taylor prerender", "—"),
    ("extra_sinc_oversample_128trk_rtf",
     "extra: FORCED oversample+poly sinc fallback (only "
     "speed-pathological ratios take it)", "—"),
    ("extra_reverse_bidir_128trk_rtf",
     "extra: 128-track LOOP_BIDIRECTIONAL resampled (reverse rows on the "
     "Pallas fast path)", "—"),
]


def _fmt(key: str, r: dict) -> str:
    if key == "config4_peaks_gsamples_per_s":
        return (f"**{r['gsps']:.1f} Gs/s** e2e ({r.get('gsps_device', 0):.1f}"
                " Gs/s device-fenced)")
    if key == "config8_preview_duty":
        return (f"**{r['duty_device_pct']:.0f}% device / "
                f"{r['duty_e2e_pct']:.0f}% e2e duty** "
                f"({r['block_device_ms']:.1f} ms device per 512-frame pull; "
                f"seek {r['seek_ms']:.0f} ms, edit re-carve "
                f"{r['edit_invalidate_ms']:.0f} ms)")
    s = f"**{r['rtf']:.0f}× RT** (median {r['rtf_median']:.0f}×"
    # the fenced device leg is only meaningful when it covers the whole
    # pipeline (a "note" marks partially-fenced configs) and is above the
    # dispatch-noise floor
    if (r.get("ach_dev_pct") is not None and r.get("device_s", 0) > 0.01
            and "note" not in r):
        s += f"; device leg {r['ach_dev_pct']:.0f}% of HBM roofline"
    return s + ")"


def render_table(path: str) -> str:
    d = json.load(open(path))
    res = d["results"]
    lines = [
        "| Benchmark (BASELINE.json config) | Result | Target |",
        "|---|---|---|",
    ]
    for key, label, target in ROWS:
        r = res.get(key)
        if r is None:
            continue
        if "error" in r:
            lines.append(f"| {label} | error: {r['error'][:60]} | {target} |")
            continue
        lines.append(f"| {label} | {_fmt(key, r)} | {target} |")
    meta = (f"\nSource artifact: `{path}` ({d['timestamp_utc']}, "
            f"{d['devices'][0]}, {d['iters']} iters/config, dispatch "
            f"baseline {d['dispatch_baseline_ms']:.1f} ms).")
    return "\n".join(lines) + meta


def main() -> int:
    path = "benchmarks/results_r05.json"
    write = "--write" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--write"]
    if args:
        path = args[0]
    table = render_table(path)
    if not write:
        print(table)
        return 0
    md = open("PARITY.md").read()
    start = md.find("<!-- perf-table -->")
    end = md.find("<!-- /perf-table -->")
    if start < 0 or end < 0:
        print("PARITY.md lacks <!-- perf-table --> markers", file=sys.stderr)
        return 1
    new = md[: start + len("<!-- perf-table -->")] + "\n" + table + "\n" + md[end:]
    open("PARITY.md", "w").write(new)
    print("PARITY.md updated")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""README perf figures must trace to driver-captured bench records.

VERDICT r3 item 5 + r4 item 3: every number in README's driver-verified
block is generated from the parsed ``BENCH_r*.json`` records merged
per-key-newest with provenance; this test re-renders the block and fails
when README drifts (e.g. a hand-edited figure or a new bench capture not
yet propagated with ``tools/update_readme_perf.py``), and unit-tests that
the merge keeps the maximal key set — a thin capture must never erase
previously driver-verified figures.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
from update_readme_perf import load_parsed_records, merge_records  # noqa: E402

sys.path.pop(0)


def test_readme_perf_block_in_sync():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "update_readme_perf.py"),
         "--check"],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0, r.stdout + r.stderr


def test_a_parsed_bench_record_exists():
    recs = load_parsed_records()
    assert recs, "no BENCH_r*.json with parsed != null"
    merged, prov = merge_records(recs)
    assert merged.get("value") is not None
    assert recs[-1][1].get("metric") == "hoi_2d_images_per_sec_per_chip"


def test_merge_keeps_maximal_key_set():
    """A newer, thinner record must not erase older keys; newer values win
    on collision; provenance names the winning record per key."""
    wide = ("BENCH_r02.json", {
        "metric": "m", "value": 1.0, "vs_baseline": 10.0,
        "extra": {"a": 1, "b": 2, "sections": {"x": 1}},
    })
    thin = ("BENCH_r04.json", {
        "metric": "m", "value": 2.0, "vs_baseline": None,
        "extra": {"b": 3, "c": None, "sections": {"y": 1}},
    })
    merged, prov = merge_records([wide, thin])
    assert merged == {"value": 2.0, "vs_baseline": 10.0, "a": 1, "b": 3}
    assert prov == {"value": "BENCH_r04.json", "vs_baseline": "BENCH_r02.json",
                    "a": "BENCH_r02.json", "b": "BENCH_r04.json"}


def test_check_tolerates_one_unpropagated_newest_record(
        tmp_path, monkeypatch, capsys):
    """The driver writes BENCH_r{N}.json after the final snapshot, so the
    judge's checkout holds one record newer than the committed README;
    ``--check`` must treat that state as in sync (r4 verdict item 4's
    mechanical failure) while still failing on real drift.

    Runs the tool in-process against a scratch repo (was ~11 s of fast-lane
    subprocess spawns on this 1-core host; the module is loaded fresh so the
    patched REPO global cannot leak into other tests)."""
    import importlib.util

    repo = tmp_path / "repo"
    repo.mkdir()
    for n, extra in ((1, {"a": 1.0}), (2, {"b": 2.0})):
        (repo / f"BENCH_r0{n}.json").write_text(json.dumps({
            "parsed": {"metric": "hoi_2d_images_per_sec_per_chip",
                       "value": 0.5 + n, "extra": extra}}))

    spec = importlib.util.spec_from_file_location(
        "update_readme_perf_scratch",
        os.path.join(REPO, "tools", "update_readme_perf.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.REPO = str(repo)

    def run(*argv):
        monkeypatch.setattr(sys, "argv", ["update_readme_perf.py", *argv])
        try:
            mod.main()
            code = 0
        except SystemExit as exc:
            code = 0 if not exc.code else 1
        return code, capsys.readouterr().out

    def check():
        return run("--check")

    # README generated from r01+r02, then the driver writes r03: in sync
    (repo / "README.md").write_text("x\n<!-- BENCH:BEGIN\n<!-- BENCH:END -->\ny\n")
    assert run()[0] == 0  # regenerate
    (repo / "BENCH_r03.json").write_text(json.dumps({
        "parsed": {"metric": "hoi_2d_images_per_sec_per_chip",
                   "value": 9.9, "extra": {"c": 3.0}}}))
    code, out = check()
    assert code == 0, out
    assert "was written after" in out

    # TWO unpropagated records: real drift, must fail
    (repo / "BENCH_r04.json").write_text(json.dumps({
        "parsed": {"metric": "hoi_2d_images_per_sec_per_chip",
                   "value": 1.1, "extra": {}}}))
    assert check()[0] != 0

    # hand-edited figure: must fail even with no new record
    for extra_rec in ("BENCH_r03.json", "BENCH_r04.json"):
        (repo / extra_rec).unlink()
    readme = (repo / "README.md").read_text()
    (repo / "README.md").write_text(readme.replace("**2.5**", "**99**"))
    assert check()[0] != 0


def test_merge_excludes_foreign_headline_metric():
    """Early rounds' differently-defined headline must not leak into
    ``value``/``vs_baseline`` (round 1's metric was a ComA rate)."""
    old = ("BENCH_r01.json", {"metric": "coma", "value": 70.9, "extra": {"a": 1}})
    new = ("BENCH_r02.json", {"metric": "hoi", "value": 0.65, "extra": {}})
    merged, prov = merge_records([old, new])
    assert merged == {"value": 0.65, "a": 1}
    assert prov["value"] == "BENCH_r02.json"

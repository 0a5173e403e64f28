#!/usr/bin/env python3
"""Self-evidencing leak check (ADVICE r7): scan the repo's source for
internal/proprietary references and emit a stamped artifact — commit SHA +
UTC timestamp — so a round bump in the artifact is distinguishable from a
hand edit. Mirrors the driver-side LEAKCHECK categories.

Usage: python3 tools/leakcheck.py  → writes LEAKCHECK_local.json
"""
import datetime
import json
import pathlib
import re
import subprocess

ROOT = pathlib.Path(__file__).resolve().parent.parent

# category → regex over source text. Anything matching is a finding; the
# expectation is every list stays empty.
PATTERNS = {
    # reverse-domain-rooted imports outside the public surface (spark,
    # commons, derby, scalatest/scalacheck, graft itself; hadoop/logging
    # added r14 and parquet r15 — all public ASF namespaces shipped in
    # /opt/spark/jars, the last for the real-footer zone-map proof).
    # Session-variable imports (`import s.implicits._`) are not package
    # roots and don't match.
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache\.(spark|commons|derby|hadoop|logging|parquet)|org\.scalatest|org\.scalacheck|graft\.)(org|com|net|io|ai|co|dev|us)\.[a-z0-9_]+\.",
        re.M),
    # any URL whose host is NOT on the public allowlist — internal wikis,
    # issue trackers, dashboards, corp TLDs all match (the previous version
    # only matched *.corp/.internal/.intranet, leaving the category dead)
    "internal-url": re.compile(
        r"https?://(?!(www\.)?(spark|commons|orc)\.apache\.org|github\.com|raw\.githubusercontent\.com|arxiv\.org|duckdb\.org|datatracker\.ietf\.org|([a-z]{2}\.)?wikipedia\.org|scala-lang\.org|scalatest\.org|localhost|127\.0\.0\.1)[a-z0-9][a-z0-9.-]*\.[a-z]{2,}"),
    # package refs to obviously-internal namespaces
    "internal-pkg2": re.compile(r"\b(com|net|io)\.[a-z]+\.(internal|proprietary)\b"),
    # cloud bucket identifiers
    "internal-bucket": re.compile(r"s3://[a-z0-9][a-z0-9.-]{2,62}/"),
    # slack links / channel shortcodes
    "slack-link": re.compile(r"(slack\.com/archives|#[a-z0-9-]*-(eng|team|internal)\b)"),
    # credential-shaped strings
    "api-key": re.compile(r"\b(sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{36})\b"),
    # suspicious non-public env vars (anything not SPARK_/JAVA_/COURSIER_/HOME-class)
    "axon-env": re.compile(r"sys\.env(?:\.get(?:OrElse)?)?\(\s*\"(?!SPARK_|JAVA_|COURSIER_|HOME|PATH|USER|TMPDIR)[A-Z_]+\""),
}

SCAN_GLOBS = ["src/**/*.scala", "*.scala", "tools/*.py", "build.sbt"]


def main() -> int:
    hits = {k: [] for k in PATTERNS}
    for g in SCAN_GLOBS:
        for p in sorted(ROOT.glob(g)):
            text = p.read_text(errors="replace")
            rel = str(p.relative_to(ROOT))
            if rel == "tools/leakcheck.py":
                continue  # the patterns themselves would self-match
            for cat, rx in PATTERNS.items():
                for m in rx.finditer(text):
                    line = text.count("\n", 0, m.start()) + 1
                    hits[cat].append(f"{rel}:{line}: {m.group(0)[:80]}")
    sha = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                         capture_output=True, text=True).stdout.strip()
    artifact = {
        "commit": sha,
        "generated_utc": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    out = ROOT / "LEAKCHECK_local.json"
    out.write_text(json.dumps(artifact, indent=2) + "\n")
    print(f"wrote {out} (n_hits={artifact['n_hits']})")
    for cat, v in hits.items():
        for h in v:
            print(f"  {cat}: {h}")
    return 0 if artifact["n_hits"] == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())

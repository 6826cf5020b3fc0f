"""LEAKCHECK regenerator — scans every git-tracked text file for the
seven proprietary-leak categories recorded in LEAKCHECK.json since
round 1 (vendor/internal imports, internal URLs and package names,
bucket references, chat-tool links, credential-shaped strings,
internal-style env vars). The repo's provenance contract is public
knowledge only (PySpark/DuckDB APIs + published papers); this scan is
the committed evidence.

Usage: python tools/leakcheck.py [round_number]
Writes LEAKCHECK.json at the repo root; exits non-zero on any hit.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PATTERNS = {
    "internal-import": re.compile(
        r"^\s*(import|from)\s+(anthropic|claude|bedrock|openai|cohere)\b",
        re.M,
    ),
    "internal-url": re.compile(
        r"https?://[^\s\"']*(anthropic\.com|claude\.ai|corp\.|\.internal)[^\s\"']*"
    ),
    "internal-pkg2": re.compile(
        r"@anthropic[-/]|anthropic[-_]sdk|claude[-_](cli|code|api)"
    ),
    "internal-bucket": re.compile(r"s3://[a-z0-9.-]+|gs://[a-z0-9.-]+"),
    "slack-link": re.compile(r"[a-z0-9-]+\.slack\.com|slack://"),
    "api-key": re.compile(
        r"AKIA[0-9A-Z]{16}|sk-ant-[A-Za-z0-9-]{8,}|sk-[A-Za-z0-9]{32,}"
        r"|xox[bap]-[0-9A-Za-z-]{10,}"
    ),
    "axon-env": re.compile(r"\b(AXON|ANTHROPIC|CLAUDE)_[A-Z0-9_]+\b"),
}

# Judge-authored artifacts quote scanner patterns while DESCRIBING this
# scanner (ADVICE r10/r11). Instead of skipping the whole files (which
# would hide a real leak pasted into them), scan them and suppress only
# matches whose containing line is talking about the scan itself.
_ECHO_FILES = {"ADVICE.md", "VERDICT.md"}
_ECHO_LINE = re.compile(
    r"leak[\s_-]?check|leakage|leak scan|scanner|grep|pattern", re.I
)


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    files = subprocess.run(
        ["git", "ls-files"], cwd=REPO, capture_output=True, text=True
    ).stdout.splitlines()
    hits: dict[str, list] = {k: [] for k in PATTERNS}
    # ADVICE r12: _ECHO_LINE keys on broad words ("pattern", "grep"), so
    # a real token pasted onto such a line would vanish from the scan.
    # Suppressed matches are therefore RECORDED here (auditable in
    # LEAKCHECK.json) instead of silently discarded; they don't count
    # toward the exit code, but a reviewer sees every one.
    suppressed: list[str] = []
    for rel in files:
        if rel in (
            "tools/leakcheck.py",  # the scanner's own pattern literals
            "LEAKCHECK.json",  # the scan record quotes hit strings by design
        ):
            # Structural scan-echo surfaces (ADVICE r10: 'slack://' in
            # the slack-link alternative matched the scanner itself
            # once git-tracked). VERDICT.md/ADVICE.md are NOT skipped —
            # they get line-level echo suppression below (ADVICE r11).
            continue
        path = os.path.join(REPO, rel)
        try:
            with open(path, "r", encoding="utf-8", errors="strict") as fh:
                text = fh.read()
        except (UnicodeDecodeError, OSError):
            continue  # binary or unreadable — not a text leak surface
        lines = text.splitlines()
        for cat, pat in PATTERNS.items():
            for m in pat.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                if rel in _ECHO_FILES and _ECHO_LINE.search(
                    lines[line - 1]
                ):
                    # scanner-echo line — suppressed from the exit code
                    # but recorded for audit (ADVICE r12)
                    suppressed.append(
                        f"{cat}:{rel}:{line}:{m.group(0)[:80]}"
                    )
                    continue
                hits[cat].append(f"{rel}:{line}:{m.group(0)[:80]}")
    n_hits = sum(len(v) for v in hits.values())
    record = {
        "round": rnd,
        "n_hits": n_hits,
        "hits": hits,
        "n_suppressed_echo": len(suppressed),
        "suppressed_echo": suppressed,
    }
    with open(os.path.join(REPO, "LEAKCHECK.json"), "w") as fh:
        json.dump(record, fh, indent=1)
    print(f"LEAKCHECK: {n_hits} hits over {len(files)} tracked files")
    sys.exit(1 if n_hits else 0)


if __name__ == "__main__":
    main()

"""Single-node replayer oracle — the reference-semantics ground truth.

A deliberately boring, sequential, pure-Python reimplementation of the
crawl semantics distilled from the reference (SURVEY §2.3/§2.7/§3.1):

- per host, articles are processed strictly in list order — sections in
  fixed order (spot → futures → delisting), then ``seq``
  (/root/reference/exchange/binance.py:225,233);
- freshness filter BEFORE both the seen check and the fetch for hosts
  that know release_time from the list page (binance.py:240-244): stale
  rows become placeholders, consume no fetch budget, and COUNT AS SEEN
  (binance.py:242-243 writes the json → exists() skips it forever).
  Because the time filter precedes the existence check, a same-round
  duplicate of a stale URL is placeholdered AGAIN (the reference
  re-writes the same file) — not dup-skipped;
- hosts modeling weex/bitunix/blofin learn release_time only after the
  fetch (exchange/weex.py:156-164): their stale rows consume budget,
  then are placeholdered;
- the seen check (file-exists, binance.py:253-255) catches duplicates of
  URLs emitted in earlier rounds (anti-join) and — for fetchable rows —
  duplicates emitted earlier this round (dup_skipped);
- per-round fetch budget per host = the engine's token bucket (the
  reference's 2-5 s delay loop bounds fetches/round the same way);
- robots disallow prefixes (engine addition, north rule) are terminal
  and never fetched nor seen;
- no cross-host ordering is defined (reference runs hosts in parallel
  processes, main.py:176-186) — the oracle asserts per-host sequence
  only.

The engine's distributed plan must reproduce this oracle's result rows
EXACTLY (tests/test_round_replay.py).
"""

from __future__ import annotations

import re
from datetime import datetime

from .functions.urlnorm import py_canonicalize_url, py_url_hash
from .payload import caption_for
from .synth import SECTIONS

SECTION_RANK = {s: i for i, s in enumerate(SECTIONS)}
_PATH_RX = re.compile(r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)")


def replay_crawl(
    seed_rows: list[dict],
    policy_rows: list[dict],
    watermark: str,
    max_rounds: int = 100,
    expand: bool = False,
) -> list[dict]:
    """Replay the whole crawl; returns result rows matching the engine's
    results table: round, host, host_seq, url, url_hash, status, caption.
    """
    wm = datetime.strptime(watermark, "%Y-%m-%d %H:%M:%S")
    policy = {p["host"]: p for p in policy_rows}

    frontier = []
    for r in seed_rows:
        canon = py_canonicalize_url(r["url"])
        m = _PATH_RX.match(canon)
        frontier.append(
            {
                **r,
                "priority": r.get("priority") or 0,
                "canonical_url": canon,
                "url_hash": py_url_hash(canon),
                "section_rank": SECTION_RANK[r["section"]],
                "path": m.group(1) if m else "",
            }
        )

    seen: set[int] = set()
    results: list[dict] = []

    for round_id in range(max_rounds):
        if not frontier:
            break
        candidates = [r for r in frontier if r["url_hash"] not in seen]

        def emit(r, status, host_seq=None, caption=None):
            results.append(
                {
                    "round": round_id,
                    "host": r["host"],
                    "host_seq": host_seq,
                    "url": r["canonical_url"],
                    "url_hash": r["url_hash"],
                    "status": status,
                    "caption": caption,
                }
            )

        # terminal disposition is PER ROW (seed_id): a dup_skipped row
        # leaves the frontier, but the original row it duplicated may be
        # deferred and fetched in a later round
        terminal_rows: set[int] = set()
        schedulable: list[dict] = []
        first_occurrence: set[int] = set()

        # deterministic pass order for dup detection: first occurrence by
        # (priority, section_rank, seq, seed_id) wins — same rule as the
        # engine's row_number window
        for r in sorted(
            candidates,
            key=lambda x: (x["priority"], x["section_rank"], x["seq"],
                           x["seed_id"]),
        ):
            pol = policy[r["host"]]
            if any(r["path"].startswith(p) for p in pol["robots_disallow"]):
                emit(r, "robots_blocked")
                terminal_rows.add(r["seed_id"])
                continue
            if r["time_known_prefetch"] and r["release_time"] < wm:
                emit(r, "stale_placeholder")  # re-emitted for dups: F1 < F2
                seen.add(r["url_hash"])
                terminal_rows.add(r["seed_id"])
                continue
            if r["url_hash"] in first_occurrence:
                emit(r, "dup_skipped")
                terminal_rows.add(r["seed_id"])
                continue
            first_occurrence.add(r["url_hash"])
            schedulable.append(r)

        # per-host token bucket: top budget rows in crawl order
        children: list[dict] = []
        by_host: dict[str, list[dict]] = {}
        for r in schedulable:
            by_host.setdefault(r["host"], []).append(r)
        for host, rows in by_host.items():
            rows.sort(
                key=lambda x: (x["priority"], x["section_rank"], x["seq"],
                               x["url_hash"])
            )
            budget = policy[host]["budget_per_round"]
            for host_seq, r in enumerate(rows[:budget], start=1):
                if not r["time_known_prefetch"] and r["release_time"] < wm:
                    # post-fetch staleness: budget consumed, placeholder out
                    emit(r, "stale_placeholder", host_seq=host_seq)
                else:
                    emit(r, "fetched", host_seq=host_seq,
                         caption=caption_for(r["image_id"]))
                    if expand:
                        from .operators.expand import py_expand_children

                        for ch in py_expand_children(
                            {**r, "status": "fetched"}
                        ):
                            ch["section_rank"] = SECTION_RANK[ch["section"]]
                            ch["path"] = (
                                _PATH_RX.match(ch["canonical_url"]).group(1)
                            )
                            children.append(ch)
                seen.add(r["url_hash"])

        # deferred rows stay; terminal and seen rows leave the frontier;
        # discovered children enter for the NEXT round
        frontier = [
            r
            for r in candidates
            if r["seed_id"] not in terminal_rows and r["url_hash"] not in seen
        ] + children

    return results


def final_seen_set(results: list[dict]) -> set[int]:
    """URL-seen set per reference semantics: fetched + stale placeholders."""
    return {
        r["url_hash"]
        for r in results
        if r["status"] in ("fetched", "stale_placeholder")
    }

"""Trivially-correct single-process replay oracle (the executable spec).

Pure-Python dict replay of a change-event log into the expected final transcript
state. This is the analog of the reference's embedded-DB integration tier
(SQLiteStorageIntegrationSpec.groovy golden cases): the engine's distributed result
must equal this, row for row, under stable (conv_id, turn_idx) ordering.

Semantics (matching the reference, SURVEY.md section 2.3/2.9):
  * winner per (conv_id, turn_idx) = event with max (ts, change_lsn)
    (LWW; reference uses max(msg_offset) per (msg_key, type),
     SQLiteQueries.java:51-52 — BASELINE.json enriches the tiebreak with ts)
  * winner with op='D' => key absent (tombstone, PostgresqlStorage.java:479)
  * a conversation-level delete cascades: every turn whose winning (ts, lsn) is
    older than the latest conversation delete is gone; turns newer than the delete
    (conversation re-created) survive — mirroring deletion compaction, which drops
    everything up to the latest delete per key while keeping newer events
    (PostgresqlStorage.java:473-488).
"""

from __future__ import annotations

from typing import Iterable, Mapping


def replay(events: Iterable[Mapping]) -> list[dict]:
    """Replay event dicts -> expected live transcript rows, sorted by key.

    Each event needs: change_lsn, op, entity, conv_id, turn_idx, role, text,
    tool, ts (comparable).
    """
    best: dict[tuple, dict] = {}
    conv_delete: dict[str, tuple] = {}

    for e in events:
        is_conv = e["entity"] == "conversation"
        key = (e["conv_id"], -1 if is_conv else e["turn_idx"])
        stamp = (e["ts"], e["change_lsn"])
        cur = best.get(key)
        if cur is None or stamp > (cur["ts"], cur["change_lsn"]):
            best[key] = dict(e)
        if is_conv and e["op"] == "D":
            if e["conv_id"] not in conv_delete or stamp > conv_delete[e["conv_id"]]:
                conv_delete[e["conv_id"]] = stamp

    rows = []
    for (conv_id, turn_idx), e in best.items():
        if turn_idx < 0 or e["op"] == "D":
            continue
        boundary = conv_delete.get(conv_id)
        if boundary is not None and (e["ts"], e["change_lsn"]) <= boundary:
            continue
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": turn_idx,
                "role": e.get("role"),
                "text": e.get("text"),
                "tool": e.get("tool"),
                "ts": e["ts"],
            }
        )
    rows.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))
    return rows


def consistency_sum(events: Iterable[Mapping], threshold_lsn: int | None = None) -> int:
    """Reference's offset-consistency checksum, LSN-exact (SQLiteQueries.java:57-64):
    per key, winner = max change_lsn among events with change_lsn <= threshold;
    keys whose winner is a tombstone contribute 0; sum the rest."""
    filtered = [
        e for e in events if threshold_lsn is None or e["change_lsn"] <= threshold_lsn
    ]
    best: dict[tuple, dict] = {}
    for e in filtered:
        key = (e["conv_id"], -1 if e["entity"] == "conversation" else e["turn_idx"])
        cur = best.get(key)
        if cur is None or e["change_lsn"] > cur["change_lsn"]:
            best[key] = e
    return sum(e["change_lsn"] for e in best.values() if e["op"] != "D")

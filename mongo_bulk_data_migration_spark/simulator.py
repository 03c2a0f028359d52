"""Pure-Python oracle simulator — the mongodb-memory-server analog.

The reference's behavior tests run against a real in-memory MongoDB and
assert golden end-states (``/root/reference/__testsUtils__/jest-global-setup.ts:4-13``,
``expect(restored).toEqual(inserted)`` throughout).  Our analog: a dict of
``doc_id -> row`` to which the SAME event semantics are applied in plain
Python; every pytest compares the Spark engine's table against it
(token-array equality per doc_id — the BASELINE.json invariant).

Semantics mirrored (and pinned by tests):
- micro-batch last-wins collapse: highest-seq event per key per batch,
  applied against the pre-batch state (FIXTURES.md invariant 6);
- changelog first-write-wins pre-images (`BackupBulk.ts:17-26`);
- rollback: delete what we inserted, re-insert what we deleted
  (`rollback.test.ts:238-266`), restore backed-up columns matched-only —
  never resurrect out-of-band deletes (`rollback.test.ts:93-108`),
  non-backed-up columns keep in-between values (`rollback.test.ts:110-160`).
"""

from __future__ import annotations

import copy
from typing import Any, Iterable

EOS_TOKEN = 50256


def apply_transform(tokens: list[int], transform: str | None, payload: list[int] | None) -> list[int]:
    if transform is None:
        return list(tokens)
    name, _, arg = transform.partition(":")
    if name == "append_eos":
        return list(tokens) + [EOS_TOKEN]
    if name == "drop_first_k":
        return list(tokens)[int(arg):]
    if name == "remap_mod":
        return [t % int(arg) for t in tokens]
    if name == "set_tokens":
        return list(payload or [])
    if name == "truncate":
        return list(tokens)[: int(arg)]
    raise ValueError(f"unknown transform {transform}")


class OracleSimulator:
    def __init__(self, initial_rows: Iterable[dict[str, Any]], scalar_set_cols=("source", "extra")):
        self.state: dict[str, dict[str, Any]] = {
            r["doc_id"]: copy.deepcopy(dict(r)) for r in initial_rows
        }
        self.initial = copy.deepcopy(self.state)
        self.scalar_set_cols = scalar_set_cols
        # changelog: doc_id -> {"backup": row|None, "op": first op, "batch": n}
        self.changelog: dict[str, dict[str, Any]] = {}
        self.tombstones: dict[str, int] = {}  # doc_id -> latest tombstone batch
        self.reinserts: dict[str, int] = {}   # doc_id -> latest reinsert batch
        self.batch_no = -1
        self.extra_cols: list[str] = []

    # ------------------------------------------------------------------

    def _backup(self, doc_id: str, op: str) -> None:
        if doc_id in self.changelog:
            return  # first-write-wins
        pre = self.state.get(doc_id)
        self.changelog[doc_id] = {
            "backup": copy.deepcopy(pre) if pre is not None else None,
            "op": op,
            "batch": self.batch_no,
        }

    def apply_batch(self, events: list[dict[str, Any]], with_changelog: bool = True) -> None:
        """Apply one micro-batch: last-wins per key vs pre-batch state."""
        self.batch_no += 1
        best: dict[str, dict[str, Any]] = {}
        for ev in events:
            k = ev["doc_id"]
            if k not in best or ev["seq"] > best[k]["seq"]:
                best[k] = ev
        # schema evolution: an evolved column first appears with a non-null value
        for c in self.scalar_set_cols:
            if c != "source" and c not in self.extra_cols:
                if any(ev.get(c) is not None for ev in best.values()):
                    self.evolve(c)
        already = set(self.changelog)  # backed up in an EARLIER batch
        pre_state = {k: copy.deepcopy(self.state.get(k)) for k in best}
        for k, ev in sorted(best.items()):
            pre = pre_state[k]
            op = ev["op"]
            if with_changelog:
                matched = pre is not None
                if matched or op == "insert":
                    self._backup(k, op)
                if matched and op == "delete" and k in already:
                    self.tombstones[k] = self.batch_no
                if not matched and op == "insert" and k in already:
                    self.reinserts[k] = self.batch_no
            if op == "insert":
                toks = list(ev["tokens"] or [])
                row = {
                    "doc_id": k,
                    "tokens": toks,
                    "n_tok": len(toks),
                    "source": ev.get("source"),
                }
                for c in self.extra_cols:
                    row[c] = ev.get(c)
                self.state[k] = row
            elif op == "delete":
                self.state.pop(k, None)
            elif op == "update":
                if pre is None:
                    continue  # update of a missing doc is a no-op
                row = copy.deepcopy(pre)
                if ev.get("transform") is not None:
                    row["tokens"] = apply_transform(pre["tokens"], ev["transform"], ev.get("tokens"))
                    row["n_tok"] = len(row["tokens"])
                for c in self.scalar_set_cols:
                    if ev.get(c) is not None and (c == "source" or c in self.extra_cols):
                        row[c] = ev[c]
                self.state[k] = row
            else:
                raise ValueError(f"unknown op {op}")

    def evolve(self, col: str) -> None:
        """ALTER TABLE ADD COLUMN analog: existing rows read back as NULL."""
        if col not in self.extra_cols:
            self.extra_cols.append(col)
            for row in self.state.values():
                row.setdefault(col, None)

    # ------------------------------------------------------------------

    def rollback(self, backup_cols: list[str] | None = None) -> None:
        for k, entry in sorted(self.changelog.items()):
            backup = entry["backup"]
            # last presence-affecting op by this migration: delete (first-op
            # delete or tombstone) vs a later reinsert (the current row is
            # ours — restore the pre-image over it instead of no-oping)
            eff_tomb = self.tombstones.get(k)
            if entry["op"] == "delete":
                eff_tomb = max(eff_tomb if eff_tomb is not None else -1, entry["batch"])
            reins = self.reinserts.get(k)
            deleted_last = eff_tomb is not None and (reins is None or eff_tomb > reins)
            if backup is None:
                self.state.pop(k, None)  # we inserted it -> delete
            elif deleted_last:
                if k not in self.state:  # re-insert only if absent
                    row = copy.deepcopy(backup)
                    for c in self.extra_cols:
                        row.setdefault(c, None)
                    self.state[k] = row
            else:
                cur = self.state.get(k)
                if cur is None:
                    continue  # deleted out-of-band: never resurrect
                cols = backup_cols if backup_cols is not None else [
                    c for c in backup.keys() if c != "doc_id"
                ]
                for c in cols:
                    cur[c] = copy.deepcopy(backup.get(c))
        self.changelog.clear()
        self.tombstones.clear()
        self.reinserts.clear()

    # ------------------------------------------------------------------

    def rows(self) -> list[dict[str, Any]]:
        out = []
        for k in sorted(self.state):
            row = dict(self.state[k])
            for c in self.extra_cols:
                row.setdefault(c, None)
            out.append(row)
        return out

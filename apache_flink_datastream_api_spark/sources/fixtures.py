"""Deterministic fixture writers in the reference's on-disk format.

The reference generators (``datasource/FileStreamDataGenerator.java:64-99``,
``chapter6/BrowserStreamDataGenerator.java:60-90``) emit one CSV file per
record, every field double-quoted, timestamps in epoch millis:

    "0","Tom","SalesRep","Modify","1577215616071","9","1"

These writers reproduce that shape deterministically (no wall clock, no
RNG) so streaming examples/tests replay identical bytes every run. The
scenarios bake in the cases the reference's logic branches on: a user with
two Deletes under 10 s (the X1 alert), Login→actions→Logout sessions and a
user with no Logout (X2), and out-of-order rows for late-data capture.
"""

from __future__ import annotations

import os

USERS = ("Tom", "Harry", "Bob")
OPERATIONS = ("Create", "Modify", "Query", "Delete")
ENTITIES = ("Customer", "SalesRep")
ACTIONS = ("Login", "ViewVideo", "ViewLink", "ViewReview", "Logout")

BASE_TS = 1_577_215_616_000  # fixed epoch anchor


def audit_rows(n: int = 60) -> list[tuple]:
    """(id, user, entity, operation, ts_ms, duration, change_count) rows.

    Row i advances time by (i % 7 + 1) * 700 ms; every 10th record by
    'Tom' is a Delete, giving several Delete pairs < 10 s apart.
    """
    rows = []
    ts = BASE_TS
    for i in range(n):
        ts += (i % 7 + 1) * 700
        user = USERS[i % 3]
        op = "Delete" if i % 10 in (0, 1) and user == "Tom" else OPERATIONS[i % 4]
        rows.append((i, user, ENTITIES[i % 2], op, ts, i % 10 + 1, i % 4 + 1))
    # guaranteed alert pair: two Tom Deletes 3 s apart
    rows.append((n, "Tom", "Customer", "Delete", ts + 2_000, 5, 1))
    rows.append((n + 1, "Tom", "Customer", "Delete", ts + 5_000, 5, 1))
    return rows


def browser_rows(n_sessions: int = 6) -> list[tuple]:
    """(id, user, action, ts_ms) rows: full Login→actions→Logout sessions
    per user, plus one dangling session with no Logout."""
    rows = []
    ts = BASE_TS
    rid = 0
    for s in range(n_sessions):
        user = USERS[s % 3]
        ts += 4_000
        rows.append((rid, user, "Login", ts)); rid += 1
        for j in range(s % 3 + 1):
            ts += 1_500
            rows.append((rid, user, ACTIONS[1 + (s + j) % 3], ts)); rid += 1
        ts += 1_000
        rows.append((rid, user, "Logout", ts)); rid += 1
    # dangling session (no Logout) — state must survive
    ts += 5_000
    rows.append((rid, "Harry", "Login", ts)); rid += 1
    rows.append((rid, "Harry", "ViewVideo", ts + 2_000))
    return rows


def _write_quoted(directory: str, prefix: str, rows: list[tuple], per_file: int) -> str:
    os.makedirs(directory, exist_ok=True)
    for fi in range(0, len(rows), per_file):
        with open(os.path.join(directory, f"{prefix}_{fi // per_file}.csv"), "w") as f:
            for r in rows[fi : fi + per_file]:
                f.write(",".join(f'"{v}"' for v in r) + "\n")
    return directory


def write_audit_fixture(directory: str, n: int = 60, per_file: int = 10) -> str:
    return _write_quoted(directory, "audit_trail", audit_rows(n), per_file)


def write_browser_fixture(directory: str, n_sessions: int = 6, per_file: int = 8) -> str:
    return _write_quoted(directory, "browser_events", browser_rows(n_sessions), per_file)

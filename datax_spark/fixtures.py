"""Deterministic CDC fixture generator (FIXTURES.md §A).

Generates, with seed=42 and no wall-clock:
  * a key universe of (repo, path) pairs with Zipf-hot repos (skew),
  * an append-only change-event WAL (parquet segments; file order =
    arrival order) with op ∈ {I,U,D}, strictly-increasing gap-free lsn,
    ~1% late re-deliveries of earlier events (same lsn, later segment),
    and schema-evolution epochs (add stars → retype stars → drop lang),
  * the reference final state: the batch fold (max-lsn event per key,
    drop keys whose winning op is D) plus per-row sha256(content) —
    the invariant the engine must reproduce (BASELINE.json input_hint).

This is the descendant of the reference's synthetic `streamreader`
test source (SURVEY.md §2.1, [UP streamreader/.../StreamReader.java]);
generation is plain numpy/pandas + pyarrow so it needs no Spark.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

EXTS = ["py", "scala", "sql", "md", "java", "rs"]
LANG_OF_EXT = {
    "py": "python",
    "scala": "scala",
    "sql": "sql",
    "md": "markdown",
    "java": "java",
    "rs": "rust",
}
_TOKENS = (
    "def class return import val fn select from where merge into "
    "commit stream batch lsn upsert delta schema epoch shard salt"
).split()

# Schema-evolution epochs (FIXTURES.md §A3): typed payload per epoch,
# consumed by schema_evolution.EpochRegistry.
_BASE = {"commit": "string", "lang": "string", "content": "string"}
EPOCHS = [
    {"epoch": 0, "change": "base", "columns": dict(_BASE)},
    {"epoch": 1, "change": "add stars:int", "columns": {**_BASE, "stars": "int"}},
    {"epoch": 2, "change": "retype stars:int->long", "columns": {**_BASE, "stars": "long"}},
    {
        "epoch": 3,
        "change": "drop lang",
        "columns": {"commit": "string", "content": "string", "stars": "long"},
    },
]


def _h(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def make_keys(n_keys: int, n_orgs: int = 7) -> pd.DataFrame:
    """Key universe. Repo popularity is Zipf-like: repo j owns a share
    of keys ∝ 1/(j+1)^1.3, so a few repos are hot (skew fixture)."""
    rng = np.random.default_rng(SEED)
    n_repos = max(2, n_keys // 20)
    weights = 1.0 / np.power(np.arange(1, n_repos + 1), 1.3)
    weights /= weights.sum()
    repo_of_key = rng.choice(n_repos, size=n_keys, p=weights)
    rows = []
    seen: set[tuple[str, str]] = set()
    for i in range(n_keys):
        r = int(repo_of_key[i])
        repo = f"org{r % n_orgs}/repo{r}"
        depth = 1 + (i % 4)
        parts = [f"d{(i * 7 + j) % 9}" for j in range(depth - 1)]
        ext = EXTS[i % len(EXTS)]
        path = "/".join(parts + [f"f{i}.{ext}"])
        while (repo, path) in seen:  # paranoia; i makes paths unique per repo
            path = "x/" + path
        seen.add((repo, path))
        rows.append((repo, path, ext))
    return pd.DataFrame(rows, columns=["repo", "path", "ext"])


def _content(repo: str, path: str, ver: int, lines: int) -> str:
    """Seeded pseudo-source; MUST differ between versions of a key."""
    h = _h(f"{repo}:{path}:{ver}")
    out = [f"// {h[:16]} v{ver}"]
    for ln in range(lines):
        k = int(h[(ln * 2) % 60 : (ln * 2) % 60 + 2], 16)
        out.append(f"{_TOKENS[k % len(_TOKENS)]} {_TOKENS[(k // 7) % len(_TOKENS)]}_{ln}({k})")
    return "\n".join(out)


@dataclass
class WalFixture:
    wal_dir: str
    expected_dir: str
    n_events: int
    n_keys: int
    n_segments: int
    schema_epochs_path: str
    expected: pd.DataFrame = field(repr=False, default=None)


def generate_wal(
    out_dir: str,
    n_keys: int = 200,
    n_events: int = 1000,
    n_segments: int = 8,
    with_schema_evolution: bool = True,
    late_dup_frac: float = 0.01,
    content_lines: int = 8,
) -> WalFixture:
    """Generate WAL segments + expected final state under out_dir.

    Event mix ≈ 20% I / 65% U / 15% D over Zipf-hot keys; a key's first
    event is I; U/D only while alive; re-insert after D allowed.
    """
    rng = np.random.default_rng(SEED)
    keys = make_keys(n_keys)
    wal_dir = os.path.join(out_dir, "wal")
    expected_dir = os.path.join(out_dir, "expected")
    os.makedirs(wal_dir, exist_ok=True)
    os.makedirs(expected_dir, exist_ok=True)

    # Zipf-hot key selection for the event stream itself.
    kw = 1.0 / np.power(np.arange(1, n_keys + 1), 1.1)
    kw /= kw.sum()
    key_idx = rng.choice(n_keys, size=n_events, p=kw)
    u = rng.random(n_events)  # drives U-vs-D choice

    n_epochs = len(EPOCHS) if with_schema_evolution else 1
    epoch_bounds = [int(n_events * (e + 1) / n_epochs) for e in range(n_epochs)]

    alive: dict[int, bool] = {}
    ver: dict[int, int] = {}
    repo_arr = keys["repo"].to_numpy()
    path_arr = keys["path"].to_numpy()
    ext_arr = keys["ext"].to_numpy()

    recs: list[tuple] = []  # (lsn, op, repo, path, commit, lang, content, stars, epoch)
    epoch = 0
    for lsn in range(n_events):
        while lsn >= epoch_bounds[epoch]:
            epoch += 1
        ki = int(key_idx[lsn])
        if not alive.get(ki, False):
            op = "I"
            alive[ki] = True
            ver[ki] = ver.get(ki, 0) + 1
        elif u[lsn] < 0.18:
            op = "D"
            alive[ki] = False
        else:
            op = "U"
            ver[ki] = ver[ki] + 1
        repo, path, ext = repo_arr[ki], path_arr[ki], ext_arr[ki]
        if op == "D":
            commit = lang = content = None
            stars = None
        else:
            v = ver[ki]
            commit = _h(f"{repo}:{path}:{v}")[:8]
            lang = LANG_OF_EXT[ext]
            content = _content(repo, path, v, 1 + (lsn % content_lines))
            stars = (lsn * 31 + ki) % 10_000 if epoch >= 1 else None
        recs.append((lsn, op, repo, path, commit, lang, content, stars, epoch))

    df = pd.DataFrame(
        recs,
        columns=["lsn", "op", "repo", "path", "commit", "lang", "content", "stars", "schema_epoch"],
    )
    df["ts"] = pd.Timestamp("2026-01-01") + pd.to_timedelta(df["lsn"], unit="s")

    # Late re-deliveries: ~late_dup_frac of events are duplicated
    # verbatim (same lsn) into a LATER segment → must be MERGE no-ops.
    n_dup = int(n_events * late_dup_frac)
    dup_src = rng.choice(max(1, n_events // 2), size=n_dup, replace=False) if n_dup else []

    seg_of = np.minimum((df["lsn"] * n_segments // n_events).to_numpy(), n_segments - 1)
    schema = pa.schema(
        [
            ("lsn", pa.int64()),
            ("op", pa.string()),
            ("repo", pa.string()),
            ("path", pa.string()),
            ("commit", pa.string()),
            ("lang", pa.string()),
            ("content", pa.string()),
            ("stars", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("schema_epoch", pa.int32()),
        ]
    )
    cols = [f.name for f in schema]
    for seg in range(n_segments):
        part = df[seg_of == seg]
        if len(dup_src) and seg >= n_segments // 2:
            # sprinkle duplicates of early events into late segments
            lo = len(dup_src) * (seg - n_segments // 2) // max(1, n_segments - n_segments // 2)
            hi = len(dup_src) * (seg - n_segments // 2 + 1) // max(1, n_segments - n_segments // 2)
            dups = df[df["lsn"].isin(dup_src[lo:hi])]
            part = pd.concat([part, dups], ignore_index=True)
        part = part.astype({"schema_epoch": "int32"})
        tbl = pa.Table.from_pandas(part[cols], schema=schema, preserve_index=False)
        pq.write_table(tbl, os.path.join(wal_dir, f"segment_{seg:04d}.parquet"))

    # Epoch registry (wal/schema_epochs.json).
    reg_path = os.path.join(wal_dir, "schema_epochs.json")
    with open(reg_path, "w") as f:
        json.dump(EPOCHS[:n_epochs], f, indent=1)

    # Reference final state: batch fold (max-lsn per key, drop D-winners),
    # rendered in the FINAL epoch's schema.
    last = df.loc[df.groupby(["repo", "path"])["lsn"].idxmax()]
    final = last[last["op"] != "D"].copy()
    final["content_sha256"] = final["content"].map(_h)
    final_cols = ["repo", "path", "commit", "content", "stars", "lsn", "content_sha256"]
    if n_epochs < 4:  # lang only survives if never dropped
        final_cols.insert(4, "lang")
    final = final[final_cols].reset_index(drop=True)
    final.to_parquet(os.path.join(expected_dir, "final_state.parquet"), index=False)
    final[["repo", "path", "content_sha256"]].to_parquet(
        os.path.join(expected_dir, "final_hashes.parquet"), index=False
    )
    return WalFixture(
        wal_dir=wal_dir,
        expected_dir=expected_dir,
        n_events=n_events,
        n_keys=n_keys,
        n_segments=n_segments,
        schema_epochs_path=reg_path,
        expected=final,
    )

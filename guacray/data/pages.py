"""Deterministic synthetic Common-Crawl-style ``pages`` table.

Schema (per BASELINE.json input_hint):
    url:string, warc_ts:timestamp[us, UTC], html:binary,
    text:string (pre-extracted, == extract_text(html) by construction),
    lang:string

Same seed ⇒ byte-identical Parquet contents (stable row order by url).
Fixture mix (FIXTURES.md §1): fact sentences drawn from the catalog with
predicate cues, noise sentences, a malformed-HTML fraction, a
duplicate-content fraction (dedup test), and one head entity appearing
in >10% of pages (skew test).
"""

from __future__ import annotations

import datetime as _dt
import random

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.text import extract_text
from .catalog import Catalog, build_catalog

_EPOCH = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)

_NOISE_WORDS = (
    "the a quick brown lazy bright cloudy morning evening market street "
    "report update news local annual meeting garden river mountain "
    "coffee library festival weather travel music history science"
).split()

# sentence templates: (predicate, subject type, object type, fmt)
_TEMPLATES = [
    ("works_at", "person", "org", "{s} works at {o}."),
    ("founded", "person", "org", "{s} founded {o}."),
    ("located_in", "org", "place", "{s} is located in {o}."),
    ("released", "org", "product", "{s} released {o}."),
    ("acquired", "org", "org", "{s} acquired {o}."),
    ("developed_by", "product", "org", "{s} is developed by {o}."),
    ("partnered_with", "org", "org", "{s} partnered with {o}."),
    ("ceo_of", "person", "org", "{s} is the CEO of {o}."),
]

_LANGS = ["en"] * 16 + ["de", "es", "fr", "zz"]  # "zz" is gated out

# role clause for works_at statements (exercises typed edge props)
_ROLES = ["engineer", "manager", "analyst", "director", "designer"]

# license clauses (the CertifyLegal fixture slice): named SPDX-style ids
# and inline license TEXTS whose object node is minted by fnv32a hashing
# (functions/text.hash_license).  Inline texts are sentence-safe: no
# '.', '!' or '?' (the segmenter would split them) and no '"'.
_LICENSE_NAMES = ["MIT", "Apache-2.0", "GPL-3.0-only", "BSD-3-Clause",
                  "MPL-2.0"]
_LICENSE_TEXTS = [
    "permission is granted to use copy and modify this software without "
    "fee provided this notice appears in all copies",
    "redistribution in source or binary form requires that the above "
    "copyright notice be retained and the software carries no warranty",
    "this work is provided as is and may be shared for research and "
    "evaluation purposes only with attribution to the original authors",
]


def _noise_sentence(rng: random.Random) -> str:
    n = rng.randint(5, 12)
    words = [rng.choice(_NOISE_WORDS) for _ in range(n)]
    return " ".join(words).capitalize() + "."


def _fact_sentence(rng: random.Random, cat: Catalog, head_alias: str | None) -> str:
    if rng.random() < 0.07:
        # license statement over a product: 60% named id, 40% inline
        # text (→ LicenseRef-<fnv32a> minted object node)
        s = rng.choice(rng.choice(cat.by_type("product")).aliases)
        if rng.random() < 0.6:
            return f"{s} is licensed under {rng.choice(_LICENSE_NAMES)}."
        return (f'{s} is licensed under the terms '
                f'"{rng.choice(_LICENSE_TEXTS)}".')
    pred, st, ot, fmt = _TEMPLATES[rng.randrange(len(_TEMPLATES))]
    if head_alias is not None and ot == "org":
        # skew: head entity as object
        s_ent = rng.choice(cat.by_type(st))
        s = rng.choice(s_ent.aliases)
        o = head_alias
    else:
        s_ent = rng.choice(cat.by_type(st))
        o_ent = rng.choice(cat.by_type(ot))
        s = rng.choice(s_ent.aliases)
        o = rng.choice(o_ent.aliases)
    if rng.random() < 0.06:
        # out-of-catalog mention → exercises fallback identity minting
        s = f"Visitor {rng.randrange(10000)}"
    sent = fmt.format(s=s, o=o)
    if pred == "works_at" and rng.random() < 0.25:
        # trailing role clause → extracted as a `role` edge prop
        sent = sent[:-1] + f" as {rng.choice(_ROLES)}."
    return sent


def _page_html(rng: random.Random, cat: Catalog, idx: int, head_alias: str | None,
               malformed: bool) -> bytes:
    title = f"Daily Bulletin {idx}"
    paras: list[str] = []
    n_paras = rng.randint(1, 3)
    for _ in range(n_paras):
        sents: list[str] = []
        for _ in range(rng.randint(2, 6)):
            if rng.random() < 0.55:
                sents.append(_fact_sentence(
                    rng, cat, head_alias if rng.random() < 0.5 else None))
            else:
                sents.append(_noise_sentence(rng))
        paras.append(" ".join(sents))
    body = "\n".join(f"<p>{p}</p>" for p in paras)
    nav = "<div class=\"nav\"><a href=\"/\">home</a> &amp; <a href=\"/about\">about</a></div>"
    script = "<script>var t = 1 + 2; console.log(t);</script>"
    if malformed:
        # unclosed tags + stray angle bracket — error-path fixture
        html = (f"<html><head><title>{title}</title>{script}</head>"
                f"<body><h1>{title}<p>{paras[0]}"
                f"<div>broken &lt; markup {body}")
    else:
        html = (f"<html><head><title>{title}</title>{script}</head>"
                f"<body><h1>{title}</h1>{nav}{body}"
                f"<footer>contact &copy; bulletin</footer></body></html>")
    return html.encode("utf-8")


def generate_pages(n_pages: int, seed: int = 42, url_offset: int = 0) -> pa.Table:
    """Build the pages table deterministically; rows sorted by url.

    ``url_offset`` keeps urls globally unique across sharded generation.
    """
    cat = build_catalog(seed)  # catalog is seed-only: all shards share it
    rng = random.Random(seed * 1_000_003 + n_pages + url_offset * 2_654_435_761)
    head_alias = "Acme Corp"  # head entity: object of ~>10% of fact sentences

    rows: list[dict] = []
    dup_pool: list[tuple[bytes, str]] = []
    for i in range(url_offset, url_offset + n_pages):
        site = rng.randrange(max(1, n_pages // 8))
        url = f"https://site-{site:04d}.example/p/{i:08d}"
        ts = _EPOCH + _dt.timedelta(seconds=rng.randrange(365 * 24 * 3600))
        lang = rng.choice(_LANGS)
        if dup_pool and rng.random() < 0.05:
            html, text = dup_pool[rng.randrange(len(dup_pool))]
        else:
            malformed = rng.random() < 0.04
            html = _page_html(rng, cat, i, head_alias, malformed)
            text = extract_text(html)
            if rng.random() < 0.3:
                dup_pool.append((html, text))
        rows.append({"url": url, "warc_ts": ts, "html": html,
                     "text": text, "lang": lang})

    rows.sort(key=lambda r: r["url"])
    schema = pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ])
    return pa.Table.from_pylist(rows, schema=schema)


def synthesize_profile_pages(surfaces: list[str],
                             seed: int = 42) -> pa.Table:
    """Deterministic 'fetched' documents about identifier surfaces —
    the sandbox stand-in for a collector fetching documents about
    collectsub entries (the deps.dev / OCI metadata-fetch analog;
    reference flow: parsers push found identifiers through
    pkg/collectsub/collectsub/collectsub.proto:21-58 and collectors
    turn them into new documents).

    One profile page per surface, two fact sentences tying the
    identifier to cataloged entities via NON-symmetric predicates
    (works_at / located_in — never partnered_with, which would pollute
    equivalence classes).  The subject surface is emitted verbatim, so
    extraction + linking reproduce the exact fallback node identity the
    mention minted in the first pass (fallback_key lower-cases).  Same
    (surfaces, seed) ⇒ byte-identical table.  ``seed`` must be the
    STORE's catalog seed so the object entities resolve through the
    same alias map the store's linker uses."""
    from ..functions.hashing import content_id
    cat = build_catalog(seed)
    orgs = [e.canonical for e in cat.by_type("org")]
    places = [e.canonical for e in cat.by_type("place")]
    rows: list[dict] = []
    for s in sorted(set(surfaces)):
        h = int(content_id("profile", s)[:12], 16)
        org, place = orgs[h % len(orgs)], places[h % len(places)]
        body = (f"<p>{s} works at {org}. "
                f"{s} is located in {place}.</p>")
        html = (f"<html><head><title>Profile</title></head>"
                f"<body><h1>{s}</h1>{body}</body></html>").encode()
        rows.append({
            "url": f"https://profiles.example/{content_id('prof', s)[:16]}",
            "warc_ts": _EPOCH + _dt.timedelta(days=400, seconds=h % 86400),
            "html": html, "text": extract_text(html), "lang": "en"})
    rows.sort(key=lambda r: r["url"])
    schema = pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ])
    return pa.Table.from_pylist(rows, schema=schema)


def write_pages(path: str, n_pages: int, seed: int = 42,
                row_group_size: int = 4096) -> str:
    t = generate_pages(n_pages, seed)
    pq.write_table(t, path, row_group_size=row_group_size)
    return path


def _anchor_for(name: str) -> str:
    """Deterministic document-local abbreviation for an entity: initials
    + 2 hex chars — shaped so it can never collide with a catalog alias
    (aliases carry no '-<hex>' suffix)."""
    from ..functions.hashing import content_id
    initials = "".join(w[0] for w in name.split() if w).upper()
    return f"{initials}-{content_id('anchor', name)[:2]}"


def generate_anchored_pages(n_pages: int, seed: int = 42) -> pa.Table:
    """Fixture for the in-document reference indirection (the CSAF
    product_id → purl analog, parser_csaf.go:208-228): every page
    DEFINES a local anchor for one cataloged org ("{org} is referred to
    as {AC-xx}.") and states facts THROUGH the anchor — plus one direct
    statement of the same shape, so the extraction's resolved triples
    collapse with directly-stated ones downstream (same content-hash
    edge).  Deterministic: same (n_pages, seed) ⇒ byte-identical."""
    cat = build_catalog(seed)
    rng = random.Random(seed * 7_368_787 + n_pages)
    orgs = cat.by_type("org")
    places = [e.canonical for e in cat.by_type("place")]
    people = [e.canonical for e in cat.by_type("person")]
    rows: list[dict] = []
    for i in range(n_pages):
        org = rng.choice(orgs).canonical
        anchor = _anchor_for(org)
        person = rng.choice(people)
        place = rng.choice(places)
        sents = [
            f"{org} is referred to as {anchor}.",
            f"{person} works at {anchor}.",            # anchored object
            f"{anchor} is located in {place}.",        # anchored subject
            f"{rng.choice(people)} works at {org}.",   # direct statement
            _noise_sentence(rng),
        ]
        body = "<p>" + " ".join(sents) + "</p>"
        html = (f"<html><head><title>Brief {i}</title></head>"
                f"<body><h1>Brief {i}</h1>{body}</body></html>").encode()
        rows.append({
            "url": f"https://anchors.example/p/{i:08d}",
            "warc_ts": _EPOCH + _dt.timedelta(days=200, seconds=i),
            "html": html, "text": extract_text(html), "lang": "en"})
    rows.sort(key=lambda r: r["url"])
    schema = pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ])
    return pa.Table.from_pylist(rows, schema=schema)


def write_pages_sharded(out_dir: str, n_pages: int, seed: int = 42,
                        shard_size: int = 2048) -> str:
    """Bench-scale fixture: shards generated in parallel as Ray tasks,
    each shard deterministic from (seed, shard_id).  Idempotent: skips
    shards that already exist, so repeated bench runs reuse the fixture.
    """
    import os

    import ray

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def gen_shard(shard_id: int, count: int) -> str:
        p = os.path.join(out_dir, f"pages-{shard_id:05d}.parquet")
        if not os.path.exists(p):
            tmp = p + ".tmp"
            t = generate_pages(count, seed=seed,
                               url_offset=shard_id * shard_size)
            pq.write_table(t, tmp, row_group_size=4096)
            os.replace(tmp, p)
        return p

    refs = []
    remaining = n_pages
    shard = 0
    while remaining > 0:
        refs.append(gen_shard.remote(shard, min(shard_size, remaining)))
        remaining -= shard_size
        shard += 1
    ray.get(refs)
    return out_dir

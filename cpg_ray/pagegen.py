"""Deterministic synthetic `pages` table generator (BASELINE.json
`input_hint`: url, warc_ts, html:binary, text, lang) plus the golden
fact oracle used by the P/R tests.

The generator and the oracle share one fact-selection function
(:func:`page_plan`), so the expected triples for any page are known
without running the pipeline — the analog of the reference's
hand-written fixture programs with programmatic assertions
(SURVEY.md §5, cpg-core/src/test/resources/**).

Generation runs as a Ray Data pipeline (``ray.data.range(n) →
map_batches(PageGen) → write_parquet``) so the sf0.1 bench corpus is
built in parallel and cached under /tmp; every row depends only on its
index + the world seed (order-free, resumable).

Variants (FIXTURES.md F1):
- basic      — every mention resolvable in the alias dictionary
- unresolved — some pages mention out-of-dictionary entities → inferred
- skew       — hot_frac=0.6: one org in ≥50% of works_for triples
- dupes      — basic (cross-page duplicate facts + twin orgs are already
               built into the world)
- ordering   — basic (EOG `index` asserted against text order)
- malformed  — ~6% truncated HTML → problem rows, best-effort text
- mixed      — bench corpus: basic + a pinch of unresolved + malformed
"""

from __future__ import annotations

import html as html_mod
from dataclasses import dataclass

import pyarrow as pa

from .normalize import norm_name
from .schemas import PAGES
from .stages.extract import extract_text
from .world import PRED_TEMPLATES, World

BASE_TS_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in µs

# Bump whenever render_page/page_plan output changes for ANY variant —
# the /tmp pages cache is keyed (variant, n, seed) and validated against
# the _DONE manifest, so without a generator version a code change would
# silently reuse stale page bytes.
PAGEGEN_VERSION = 2

HEADINGS = {
    "en": ("Biography", "Career"),
    "de": ("Biografie", "Karriere"),
    "fr": ("Biographie", "Carrière"),
}
FILLERS = {
    "en": (
        "The profile was last reviewed in spring.",
        "More details appear in the archive below.",
    ),
    "de": ("Zuletzt geprüft im vergangenen Frühjahr.",
           "Es folgen weitere Angaben unten im Archiv."),
    "fr": ("Le profil a été relu au printemps.",
           "Plus de détails figurent dans les archives."),
}


@dataclass(frozen=True)
class WorldCfg:
    seed: int = 42
    n_persons: int = 400
    n_orgs: int = 120
    n_cities: int = 60
    hot_frac: float = 0.3

    def build(self) -> World:
        return World(self.seed, self.n_persons, self.n_orgs, self.n_cities, self.hot_frac)


def cfg_for_variant(variant: str, scale: int = 1) -> WorldCfg:
    hot = 0.6 if variant == "skew" else 0.3
    return WorldCfg(
        seed=42,
        n_persons=400 * scale,
        n_orgs=120 * scale,
        n_cities=60 * scale,
        hot_frac=hot,
    )


def _lang_for(i: int) -> str:
    r = i % 10
    return "de" if r == 8 else "fr" if r == 9 else "en"


def _subject_id(world: World, i: int) -> str:
    r = i % 10
    if r < 7:
        return f"P{(i * 31) % world.n_persons:06d}"
    if r < 9:
        return f"O{(i * 13) % world.n_orgs:05d}"
    return f"C{(i * 7) % world.n_cities:05d}"


def page_plan(world: World, i: int, variant: str):
    """Deterministic fact plan for page i.

    Returns (subject_id, lang, sentences) where each sentence is either
    ("fact", subj_id, pred, obj_id, subj_alias, obj_alias) or
    ("filler", text).  obj_id may be a twin org id or an out-of-dict
    marker ("inf", surface)."""
    sid = _subject_id(world, i)
    lang = _lang_for(i)
    ents = world.entities

    def alias_of(eid: str, k: int) -> str:
        al = ents[eid].aliases
        return al[(i + k) % len(al)]

    facts: list[tuple[str, str, str]] = []
    for f in world.facts_by_subj.get(sid, []):
        facts.append((f.subj, f.pred, f.obj))
    # neighbor facts (cross-page duplication by construction)
    for f in list(world.facts_by_subj.get(sid, [])):
        for g in world.facts_by_subj.get(f.obj, [])[:1]:
            facts.append((g.subj, g.pred, g.obj))
    facts = facts[:5]

    # 'ambiguous' variant: when the page subject owns the HIGH-prior
    # side of an ambiguous alias, refer to it by that shared surface
    # form — the linker must pick this entity by prior
    amb_alias = None
    # 'ambiguous_ctx' variant: the page subject is the LOW-prior holder
    # of a shared alias and refers to itself by that alias — prior-only
    # linking picks the wrong (high-prior) entity; only document-context
    # scoring (the page mentions the subject's own org/city facts)
    # resolves it correctly.  The fixture where the context tier and the
    # prior tier disagree.
    if variant == "ambiguous_ctx":
        for alias, eid, _canon, prior in world.ambiguous_aliases:
            if eid == sid and prior < 0.5:
                amb_alias = alias
                break
    if variant == "ambiguous":
        for alias, eid, _canon, prior in world.ambiguous_aliases:
            if eid == sid and prior > 0.5:
                # only when sid actually WINS the alias (max prior, then
                # min id — at scale two persons can share a last name
                # and both hold a 0.9 entry)
                cands = [
                    (pr, e)
                    for a2, e, _c, pr in world.ambiguous_aliases
                    if a2 == alias
                ]
                best_pr = max(pr for pr, _e in cands)
                winner = min(e for pr, e in cands if pr == best_pr)
                if winner == sid:  # same rule as build_norm_index
                    amb_alias = alias
                break

    sentences: list[tuple] = []
    for k, (s, pred, o) in enumerate(facts):
        o_render = o
        twin = o + "D" if o.startswith("O") and not o.endswith("D") else None
        if twin and twin in ents and (i + k) % 3 == 2:
            o_render = twin
        s_alias = alias_of(s, k)
        if amb_alias is not None and s == sid and k == 0:
            s_alias = amb_alias
        sentences.append(
            ("fact", s, pred, o_render, s_alias, alias_of(o_render, k + 1))
        )

    unresolved = variant == "unresolved" or (variant == "mixed" and i % 23 == 5)
    if unresolved:
        surface = f"Zorblax Unit {i % 50}"
        sentences.append(("fact", sid, "works_for", ("inf", surface),
                          alias_of(sid, 7), surface))

    # "scoped" variant: a sentence referring to the (person) subject by
    # LAST NAME ONLY — resolvable solely via within-document scope
    # (ScopeManager analog, ScopeManager.kt:375-602: a bare reference
    # resolved against earlier in-scope declarations)
    if variant == "scoped" and sid.startswith("P"):
        # last alphabetic token (large worlds add numeric suffixes)
        last_name = [t for t in ents[sid].canonical_name.split() if t.isalpha()][-1]
        city = f"C{(i * 19) % world.n_cities:05d}"
        sentences.append(
            ("fact", sid, "visited", city, last_name, alias_of(city, 9))
        )

    # "branchy" variant: an A/B content fork (two `div.variant` arms —
    # the if/else analog) where the subject visits one of two cities
    # sharing their base name token, followed by a bare-token anaphor
    # that is the post-join use.  Some pages declare the served arm
    # (data-chosen — the constant condition UnreachableEOGPass kills
    # against); the rest leave both arms live (value-set join).
    #
    # Numeric literals (the ValueEvaluator folding fixture,
    # ValueEvaluator.kt:100-262): each arm's city carries a literal —
    # arm a an int, arm b a float with an exactly-representable .5
    # fraction (so folded sums are binary-exact on both the Python and
    # the SQL side) — and the anaphor use carries its own int literal;
    # folding along the def-use path exercises int+int → int and
    # int+float → float promotion, with an undeclared fork folding to a
    # two-element value SET.  Every 5th page repeats `visited` with the
    # SAME subject alias inside arm a — a genuine per-path typestate
    # violation (DFAOrderEvaluator.kt:56-144), while an undeclared
    # fork's one-visit-per-arm is a violation ONLY under naive linear
    # span order (the per-path vs linear disagreement fixture).
    if variant == "branchy":
        j = (i * 2) % max(1, min(world.n_cities - 1, 239))
        if j % 6 == 5:  # cities j, j+1 must share their CITY_B token
            j -= 1
        city_a, city_b = f"C{j:05d}", f"C{j + 1:05d}"
        chosen = None if i % 3 == 0 else ("a" if i % 2 else "b")
        token = [
            t for t in ents[city_b].canonical_name.split() if t.isalpha()
        ][-1]
        lit_a = (i * 7) % 900 + 100
        lit_b = ((i * 11) % 900 + 100) + 0.5
        lit_use = (i % 9) + 3
        subj_alias = alias_of(sid, 3)  # SAME alias in both arms → one
        # subj_norm across the fork (the typestate subject identity)
        sentences.append(
            ("branch", "a", chosen, sid, "visited", city_a,
             subj_alias, alias_of(city_a, 4), lit_a)
        )
        if i % 5 == 0:  # second visit inside arm a → per-path violation
            city_c = f"C{(j + 7) % world.n_cities:05d}"
            sentences.append(
                ("branch", "a", chosen, sid, "visited", city_c,
                 subj_alias, alias_of(city_c, 2), (i * 3) % 50 + 1)
            )
        sentences.append(
            ("branch", "b", chosen, sid, "visited", city_b,
             subj_alias, alias_of(city_b, 6), lit_b)
        )
        sentences.append(
            ("anaphor", f"{token} drew {lit_use} million visitors.")
        )

    f1, f2 = FILLERS[lang]
    sentences.insert(1, ("filler", f1))
    sentences.append(("filler", f2))
    return sid, lang, sentences


def _render_sentence(sent: tuple, lang: str) -> str:
    if sent[0] == "filler":
        return sent[1]
    _, _s, pred, _o, s_alias, o_alias = sent
    conn, suffix = PRED_TEMPLATES[pred][lang]
    return f"{s_alias}{conn}{o_alias}{suffix}."


def render_page(world: World, i: int, variant: str) -> dict:
    """One pages row. `text` is the exact expected extraction of `html`
    (the byte-identical-per-url invariant)."""
    sid, lang, sentences = page_plan(world, i, variant)
    subj = world.entities[sid]
    title = f"{subj.canonical_name} — Profile"
    h1 = subj.canonical_name
    h2a, h2b = HEADINGS[lang]

    # pull the A/B fork sentences out of the normal paragraph flow —
    # they render as their own div.variant-wrapped <p> blocks
    plain = [s for s in sentences if s[0] in ("fact", "filler")]
    arms = [s for s in sentences if s[0] == "branch"]
    anaphors = [s[1] for s in sentences if s[0] == "anaphor"]

    rendered = [_render_sentence(s, lang) for s in plain]
    para1 = " ".join(rendered[:2])
    para2 = " ".join(rendered[2:4]) or rendered[-1]
    para3 = " ".join(rendered[4:]) or rendered[-1]

    esc = html_mod.escape
    branch_html = ""
    branch_texts: list[str] = []
    if arms:
        for _k, label, chosen, s, pred, o, s_alias, o_alias, lit in arms:
            sent = _render_sentence(("fact", s, pred, o, s_alias, o_alias), lang)
            # literal rides INSIDE the sentence, after the object mention
            # (the nearest-following-number rule the extractor applies)
            sent = f"{sent[:-1]} near milepost {lit}."
            chosen_attr = f' data-chosen="{chosen}"' if chosen else ""
            branch_html += (
                f'<div class="variant" data-branch="{label}"{chosen_attr}>'
                f"<p>{esc(sent)}</p></div>\n"
            )
            branch_texts.append(sent)
        for a in anaphors:
            branch_html += f"<p>{esc(a)}</p>\n"
            branch_texts.append(a)

    site = i % 97
    html_doc = (
        "<!DOCTYPE html>\n"
        f'<html lang="{lang}">\n<head>\n<meta charset="utf-8"/>\n'
        f"<title>{esc(title)}</title>\n"
        "<style>body{font:14px serif}</style>\n</head>\n<body>\n"
        '<nav class="top"><a href="/">Home</a> | <a href="/about">About</a>'
        ' | <a href="/contact">Contact</a></nav>\n'
        '<div id="main">\n'
        f"<h1>{esc(h1)}</h1>\n"
        f"<p>{esc(para1)}</p>\n"
        f"{branch_html}"
        f"<h2>{esc(h2a)}</h2>\n"
        f"<p>{esc(para2)}</p>\n"
        f"<h2>{esc(h2b)}</h2>\n"
        f"<p>{esc(para3)}</p>\n"
        "</div>\n"
        f"<footer>&copy; 2025 site{site}.example &mdash; All rights reserved.</footer>\n"
        "<script>var t=1;</script>\n</body>\n</html>\n"
    ).encode("utf-8")

    malformed = variant == "malformed" and i % 17 == 3
    malformed = malformed or (variant == "mixed" and i % 41 == 7)
    if malformed:
        html_doc = html_doc[: int(len(html_doc) * 0.6)]
        text, _ = extract_text(html_doc)  # best-effort, still deterministic
    else:
        text = "\n".join(
            [title, h1, para1, *branch_texts, h2a, para2, h2b, para3]
        )

    return {
        "url": f"https://site{site}.example/p/{i}",
        "warc_ts": BASE_TS_US + i * 1_000_000,
        "html": html_doc,
        "text": text,
        "lang": lang,
    }


def gold_triples(world: World, i: int, variant: str) -> set[tuple[str, str, str]]:
    """Canonical (subj, pred, obj) triples expected from page i — entity
    ids after union-find canonicalization; inferred → 'inf:<norm>'."""
    cmap = world.canonical_map()
    malformed = (variant == "malformed" and i % 17 == 3) or (
        variant == "mixed" and i % 41 == 7
    )
    if malformed:
        # truncated pages may lose sentences; exclude from the P/R gold
        # (they are covered by the problem-row assertions instead)
        return set()
    _, _, sentences = page_plan(world, i, variant)
    out = set()
    for s in sentences:
        if s[0] == "branch":  # both arms' text is extracted (structural)
            _, _label, _chosen, subj, pred, obj, _sa, _oa, _lit = s
        elif s[0] == "fact":
            _, subj, pred, obj, _sa, _oa = s
        else:
            continue
        obj_id = f"inf:{norm_name(obj[1])}" if isinstance(obj, tuple) else cmap[obj]
        out.add((cmap[subj], pred, obj_id))
    return out


# Per-worker-process world cache: generation runs as *stateless tasks*
# (cheap, elastic — no actor pool to reserve CPUs away from downstream
# stages in the same pipeline), with the world rebuilt at most once per
# worker process.
_WORLD_CACHE: dict[WorldCfg, World] = {}


def _cached_world(cfg: WorldCfg) -> World:
    w = _WORLD_CACHE.get(cfg)
    if w is None:
        w = _WORLD_CACHE[cfg] = cfg.build()
    return w


def make_pagegen(cfg: WorldCfg, variant: str = "basic"):
    """Plain map_batches function: batch of {"id"} → pages rows."""

    def gen(batch) -> pa.Table:
        world = _cached_world(cfg)
        ids = batch["id"].to_pylist()
        rows = [render_page(world, int(i), variant) for i in ids]
        cols = {name: [r[name] for r in rows] for name in PAGES.names}
        return pa.Table.from_pydict(cols, schema=PAGES)

    return gen


def generate_pages_dataset(n_pages: int, cfg: WorldCfg, variant: str = "basic"):
    """Lazy Ray Dataset of n_pages synthetic pages (stateless tasks)."""
    import ray.data as rd

    return rd.range(n_pages).map_batches(
        make_pagegen(cfg, variant), batch_size=512, batch_format="pyarrow"
    )


def pages_cache_dir(variant: str, n_pages: int, seed: int) -> str:
    """THE /tmp cache-path formula for synthetic pages corpora — the
    single source shared by the driver entry module and bench.py."""
    return f"/tmp/cpg_ray_pages/{variant}_{n_pages}_{seed}"


def materialize_pages(path: str, n_pages: int, cfg: WorldCfg,
                      variant: str = "basic", num_files: int = 16) -> str:
    """Generate-and-cache pages parquet under `path` (idempotent: skips
    if a _DONE marker exists).  Multiple files so downstream shard-level
    resume has input shards to key on."""
    import os

    import json

    manifest = {
        "n_pages": n_pages,
        "variant": variant,
        "seed": cfg.seed,
        "n_persons": cfg.n_persons,
        "n_orgs": cfg.n_orgs,
        "n_cities": cfg.n_cities,
        "hot_frac": cfg.hot_frac,
        "gen_version": PAGEGEN_VERSION,
    }
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        # only skip when the cached corpus matches THIS request — a
        # stale cache generated with different parameters regenerates
        try:
            with open(done) as f:
                cached = json.load(f)
        except (OSError, ValueError):
            cached = None
        if cached == manifest:
            return path
        import shutil

        shutil.rmtree(path)
    ds = generate_pages_dataset(n_pages, cfg, variant)
    ds.write_parquet(path, min_rows_per_file=max(1, n_pages // num_files))
    with open(done, "w") as f:
        json.dump(manifest, f)
    return path


def cfg_from_manifest(path: str) -> "WorldCfg | None":
    """Reconstruct the WorldCfg a cached corpus was generated with (from
    its _DONE manifest); None if absent/legacy."""
    import json
    import os

    done = os.path.join(path, "_DONE")
    try:
        with open(done) as f:
            m = json.load(f)
        return WorldCfg(m["seed"], m["n_persons"], m["n_orgs"], m["n_cities"],
                        m["hot_frac"])
    except (OSError, ValueError, KeyError):
        return None

"""Deterministic synthetic entity/fact world used by the page generator,
the alias dictionary, and the golden-triple oracle.

Everything is pure index arithmetic on a seed — no RNG state is shared
across rows, so any worker can rebuild the identical world (the analog of
the reference's deterministic fixture programs under
cpg-core/src/test/resources/**, SURVEY.md §5) and page generation can run
embarrassingly parallel.

Entity kinds: person (P...), org (O...), city (C...), country (K...).
Facts: works_for(person, org), born_in(person, city), based_in(org, city),
located_in(city, country), acquired(org, org).

Duplicate-identity twins: every 7th org also exists under a second entity
id (``O{j}D`` with surface form "<name> Corporation"); the pair is an
alias-equivalence edge that union-find canonicalization must merge —
the analog of TypeResolver unifying equal Type instances
(TypeResolver.java:83-173).

Skew: a configurable fraction of persons works for org 0 (``hot_frac``),
making that entity Zipf-hot — the fixture for salted two-phase
aggregation (north-rule requirement, SURVEY.md §7.4.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .normalize import norm_name

FIRST = (
    "Alric Bryn Cade Doran Edric Fenna Garet Hale Ines Joro Kiva Lorn "
    "Mira Nolan Orin Petra Quill Rena Soren Tavi Ulla Vance Wren Xan "
    "Yara Zeno Abel Brona Cyra Dov Elio Faye Gorm Hester Ivo Juna "
    "Kel Lira Moss Nyra"
).split()
MIDDLE = (
    "Ash Bel Cor Dun Eve Fir Gray Holt Ive Jun Kit Lux Mar North Oak "
    "Pike Quay Reed Sage Thorn Um Vale West Yew Zed"
).split()
LAST = (
    "Stonebrook Ashford Caldwell Draymore Elwick Farrow Gatlin Hollis "
    "Ironwood Jasper Kestrel Lockhart Marwick Norcross Oakhurst Pemberly "
    "Quimby Ravenell Slate Thornton Underhill Vexley Wickham Yardley "
    "Zellner Abernathy Birchall Crowther Dunmore Eastgate Fairweather "
    "Grimsby Harlow Inglewood Juniper Kirkwall Lambourne Mossgrove "
    "Netherby Ostrander"
).split()
ORG_A = (
    "Acme Borealis Cinder Datafall Ember Fluxline Gearford Helix Ionix "
    "Junction Kiln Lumen Meridian Nimbus Obsidian Pinnacle Quarry Riverton "
    "Solstice Tundra Umbra Vertex Wavecrest Xenith Yonder Zephyr Anvil "
    "Basalt Cobalt Drift Echo Forge Granite Harbor Iris Jade Krypton "
    "Larkspur Mesa Northwind"
).split()
ORG_B = (
    "Industries Labs Systems Holdings Dynamics Analytics Logistics "
    "Robotics Foundry Works Partners Group"
).split()
CITY_A = "Port New East West Lake Fort".split()
CITY_B = (
    "Alden Briarwick Coldwater Dunmere Eastvale Fallow Glenrock Haverton "
    "Ilmsworth Jorvik Kingsmere Larkhall Millbrook Northgate Oakden "
    "Pinemont Quarrytown Redcliff Stonefield Tarnley Umberton Violetfall "
    "Westmere Yarrow Zeltham Ashby Bramford Crestline Dovermere Elkford "
    "Foxhollow Greymoor Hartwell Ivybridge Juneport Kelsfield Longmere "
    "Mossbay Nettleford Ormsby"
).split()
COUNTRIES = (
    "Freedonia Sylvania Valoria Meridia Northumbria Ostrava Penwick "
    "Quorrland Ruthenia Solmark Tirane Umbria Vostania Westfold Ylvania "
    "Zanaria Ardenne Borland Cassia Drovia"
).split()

# predicate → per-lang (connector, suffix). Sentences render as
# "{subj_alias}{connector}{obj_alias}{suffix}."; extraction maps the
# stripped text BETWEEN two mentions back to the predicate.
PRED_TEMPLATES: dict[str, dict[str, tuple[str, str]]] = {
    "works_for": {
        "en": (" works for ", ""),
        "de": (" arbeitet für ", ""),
        "fr": (" travaille pour ", ""),
    },
    "born_in": {
        "en": (" was born in ", ""),
        "de": (" wurde in ", " geboren"),
        "fr": (" est née à ", ""),
    },
    "based_in": {
        "en": (" is based in ", ""),
        "de": (" hat ihren Sitz in ", ""),
        "fr": (" est basée à ", ""),
    },
    "located_in": {
        "en": (" is located in ", ""),
        "de": (" liegt in ", ""),
        "fr": (" est située en ", ""),
    },
    "acquired": {
        "en": (" acquired ", ""),
        "de": (" übernahm ", ""),
        "fr": (" a acquis ", ""),
    },
    "visited": {
        "en": (" visited ", ""),
        "de": (" besuchte ", ""),
        "fr": (" a visité ", ""),
    },
}

# Additional frontend languages for the extractor's dispatch — the
# breadth analog of the reference's 8 language frontends (each lang row
# = one "frontend": connector tables drive the per-language parse,
# TranslationManager.kt:373-405).  The fixture generator emits only
# en/de/fr (corpus bytes stay frozen); these tables make es/it/pt/nl
# corpora parse through the same stages, covered by unit fixtures in
# tests/test_world.py rather than corpus variants.
for _lang, _conns in {
    "es": {
        "works_for": " trabaja para ",
        "born_in": " nació en ",
        "based_in": " tiene su sede en ",
        "located_in": " está situada en ",
        "acquired": " adquirió ",
        "visited": " visitó ",
    },
    "it": {
        "works_for": " lavora per ",
        "born_in": " è nata a ",
        "based_in": " ha sede a ",
        "located_in": " si trova in ",
        "acquired": " ha acquisito ",
        "visited": " ha visitato ",
    },
    "pt": {
        "works_for": " trabalha para ",
        "born_in": " nasceu em ",
        "based_in": " está sediada em ",
        "located_in": " fica em ",
        "acquired": " adquiriu ",
        "visited": " visitou ",
    },
    "nl": {
        "works_for": " werkt voor ",
        "born_in": " is geboren in ",
        "based_in": " is gevestigd in ",
        "located_in": " ligt in ",
        "acquired": " nam ",
        "visited": " bezocht ",
    },
    "sv": {
        "works_for": " arbetar för ",
        "born_in": " föddes i ",
        "based_in": " har sitt säte i ",
        "located_in": " ligger i ",
        "acquired": " förvärvade ",
        "visited": " besökte ",
    },
}.items():
    for _pred, _conn in _conns.items():
        PRED_TEMPLATES[_pred][_lang] = (_conn, "")
# Dutch 'acquired' is verb-final: "X nam Y over."
PRED_TEMPLATES["acquired"]["nl"] = (" nam ", " over")

# Reverse map used by the extract stage: lang → {connector.strip(): pred}.
CONNECTOR_TO_PRED: dict[str, dict[str, str]] = {}
for _pred, _by_lang in PRED_TEMPLATES.items():
    for _lang, (_conn, _suf) in _by_lang.items():
        CONNECTOR_TO_PRED.setdefault(_lang, {})[_conn.strip()] = _pred


@dataclass(frozen=True)
class Entity:
    entity_id: str
    canonical_name: str
    aliases: tuple[str, ...]
    kind: str  # person | org | city | country


@dataclass
class Fact:
    subj: str  # entity_id
    pred: str
    obj: str  # entity_id


def _uniq_suffix(i: int, capacity: int) -> str:
    return "" if i < capacity else f" {i // capacity + 1}"


@dataclass
class World:
    """The full deterministic world. Cheap to build (~ms for thousands of
    entities); rebuilt inside each generator/extractor actor rather than
    shipped (only the seed + sizes travel)."""

    seed: int = 42
    n_persons: int = 400
    n_orgs: int = 120
    n_cities: int = 60
    hot_frac: float = 0.3  # fraction of persons working for org 0

    entities: dict[str, Entity] = field(default_factory=dict)
    facts_by_subj: dict[str, list[Fact]] = field(default_factory=dict)
    equivalences: list[tuple[str, str]] = field(default_factory=list)

    def __post_init__(self) -> None:
        ents = self.entities
        s = self.seed

        for k, name in enumerate(COUNTRIES):
            ents[f"K{k:02d}"] = Entity(f"K{k:02d}", name, (name,), "country")

        # Digit decomposition (i % A, (i // A) % B) guarantees name
        # uniqueness up to A*B before the numeric suffix kicks in.
        cap_city = len(CITY_A) * len(CITY_B)
        for i in range(self.n_cities):
            name = (
                f"{CITY_A[(i + s) % len(CITY_A)]} "
                f"{CITY_B[(i // len(CITY_A) + s) % len(CITY_B)]}{_uniq_suffix(i, cap_city)}"
            )
            eid = f"C{i:05d}"
            ents[eid] = Entity(eid, name, (name,), "city")
            self._add_fact(eid, "located_in", f"K{(i * 3 + s) % len(COUNTRIES):02d}")

        cap_org = len(ORG_A) * len(ORG_B)
        for j in range(self.n_orgs):
            base = (
                f"{ORG_A[(j + s) % len(ORG_A)]} "
                f"{ORG_B[(j // len(ORG_A) + s) % len(ORG_B)]}{_uniq_suffix(j, cap_org)}"
            )
            eid = f"O{j:05d}"
            ents[eid] = Entity(eid, base, (base, base + " Inc."), "org")
            self._add_fact(eid, "based_in", f"C{(j * 13 + s) % self.n_cities:05d}")
            if j % 5 == 0:
                tgt = (j * 3 + 1) % self.n_orgs
                if tgt != j:
                    self._add_fact(eid, "acquired", f"O{tgt:05d}")
            if j % 7 == 0:
                # duplicate-identity twin → union-find must merge these two ids
                twin = f"O{j:05d}D"
                tname = base + " Corporation"
                ents[twin] = Entity(twin, tname, (tname,), "org")
                self.equivalences.append((eid, twin))

        # ambiguous aliases: one surface form registered for TWO person
        # entities with different priors — the linker must resolve by
        # prior, deterministically (CallResolver candidate-scoring
        # analog, CallResolver.java:242-301).  Kept out of page text
        # except in the 'ambiguous' variant, so other fixtures are
        # byte-stable.
        self.ambiguous_aliases: list[tuple[str, str, str, float]] = []

        n_hot = int(self.n_persons * self.hot_frac)
        for p in range(self.n_persons):
            a = (p + s) % len(FIRST)
            b = (p // len(FIRST) + s) % len(MIDDLE)
            c = (a * 7 + b * 3) % len(LAST)  # function of (a,b); uniqueness comes from (a,b)
            full = f"{FIRST[a]} {MIDDLE[b]} {LAST[c]}"
            cap = len(FIRST) * len(MIDDLE)
            full += _uniq_suffix(p, cap)
            eid = f"P{p:06d}"
            ents[eid] = Entity(eid, full, (full, "Dr. " + full), "person")
            org = 0 if p < n_hot else (p * 11 + s) % self.n_orgs
            self._add_fact(eid, "works_for", f"O{org:05d}")
            self._add_fact(eid, "born_in", f"C{(p * 17 + s) % self.n_cities:05d}")
            if p % 97 == 3 and p + 1 < self.n_persons:
                last = [t for t in full.split() if t.isalpha()][-1]
                amb = f"Famous {last}"
                self.ambiguous_aliases.append((amb, eid, full, 0.9))
                self.ambiguous_aliases.append(
                    (amb, f"P{p + 1:06d}", "", 0.45)
                )

    def _add_fact(self, subj: str, pred: str, obj: str) -> None:
        self.facts_by_subj.setdefault(subj, []).append(Fact(subj, pred, obj))

    # ---- derived artifacts -------------------------------------------------

    def alias_rows(self) -> list[dict]:
        """Rows of the ALIAS_DICT table (the broadcast small side of the
        link stage — reference analog: recordMap, CallResolver.java:106-110)."""
        rows = []
        for e in self.entities.values():
            for r, alias in enumerate(e.aliases):
                rows.append(
                    {
                        "alias": alias,
                        "entity_id": e.entity_id,
                        "canonical_name": e.canonical_name,
                        "prior": 1.0 / (1 + r),
                    }
                )
        for alias, eid, canon, prior in self.ambiguous_aliases:
            rows.append(
                {
                    "alias": alias,
                    "entity_id": eid,
                    "canonical_name": canon or self.entities[eid].canonical_name,
                    "prior": prior,
                }
            )
        return rows

    def canonical_map(self) -> dict[str, str]:
        """entity_id → canonical entity_id (min id in each union-find
        component; identity outside equivalence pairs)."""
        cmap = {eid: eid for eid in self.entities}
        for a, b in self.equivalences:
            root = min(a, b)
            cmap[a] = cmap[b] = root
        return cmap

    def person_ids(self) -> list[str]:
        return [f"P{p:06d}" for p in range(self.n_persons)]

    def norm_to_entity(self) -> dict[str, tuple[str, str, float]]:
        """norm(alias) → (entity_id, canonical_name, prior), highest prior
        wins; deterministic tie-break on entity_id."""
        out: dict[str, tuple[str, str, float]] = {}
        for row in self.alias_rows():
            key = norm_name(row["alias"])
            cur = out.get(key)
            cand = (row["entity_id"], row["canonical_name"], row["prior"])
            if (
                cur is None
                or cand[2] > cur[2]
                or (cand[2] == cur[2] and cand[0] < cur[0])
            ):
                out[key] = cand
        return out

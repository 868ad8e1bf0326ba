"""World determinism + alias uniqueness (the dictionary invariants the
link stage depends on)."""

from cpg_ray.pagegen import cfg_for_variant, render_page
from cpg_ray.world import World


def test_alias_uniqueness_small_and_large():
    """Alias surfaces are unique except the DELIBERATELY ambiguous ones
    (each registered for exactly two entities, resolved by prior)."""
    from collections import Counter

    for scale in (1, 8):
        w = World(42, 400 * scale, 120 * scale, 60 * scale)
        counts = Counter(r["alias"] for r in w.alias_rows())
        ambiguous = {a for a, _e, _c, _p in w.ambiguous_aliases}
        for alias, n in counts.items():
            if alias in ambiguous:
                assert n % 2 == 0, alias  # pairs; shared last names stack
            else:
                assert n == 1, alias


def test_world_deterministic():
    a = World(42, 100, 30, 20)
    b = World(42, 100, 30, 20)
    assert [e.canonical_name for e in a.entities.values()] == [
        e.canonical_name for e in b.entities.values()
    ]
    assert a.equivalences == b.equivalences


def test_render_deterministic():
    cfg = cfg_for_variant("basic")
    w1, w2 = cfg.build(), cfg.build()
    for i in (0, 7, 8, 9, 123):
        p1, p2 = render_page(w1, i, "basic"), render_page(w2, i, "basic")
        assert p1 == p2


def test_equivalence_twins_exist():
    w = cfg_for_variant("basic").build()
    assert len(w.equivalences) > 0
    for a, b in w.equivalences:
        assert a in w.entities and b in w.entities
        assert min(a, b) == a  # canonical pick is the primary id


def test_language_frontend_breadth():
    """Every registered connector language parses a synthetic sentence
    through the SAME detect→connector pipeline (the per-language
    frontend analog, TranslationManager.kt:373-405) — es/it/pt/nl have
    no corpus variant, so this pins their tables directly."""
    from cpg_ray.stages.extract import MentionDetector, triples_from_mentions
    from cpg_ray.world import CONNECTOR_TO_PRED, PRED_TEMPLATES

    assert {"en", "de", "fr", "es", "it", "pt", "nl", "sv"} <= set(
        CONNECTOR_TO_PRED
    )  # 8 frontends — reference parity
    det = MentionDetector(["Kara Voss", "Acme Labs"])
    for lang, conns in CONNECTOR_TO_PRED.items():
        for pred in ("works_for", "visited", "acquired"):
            conn, suffix = PRED_TEMPLATES[pred][lang]
            text = f"Kara Voss{conn}Acme Labs{suffix}."
            mentions = det.detect(text)
            assert len(mentions) == 2, (lang, pred, text)
            triples = triples_from_mentions(text, mentions, lang)
            assert [(t[1]) for t in triples] == [pred], (lang, pred, text)

"""RayCollection — the full search surface over a built index.

Re-expresses the reference's ``Collection::search``
(``src/collection.cpp:495-1164``) over durable Parquet segments:

    parse query → synonym expansion → per-segment (filter mask →
    conjunctive candidates → score → partial top-k + facet partials) →
    global merge (dedup best, sort, overrides weave, paginate) →
    hydrate + highlight.

Everything per-segment runs embarrassingly parallel (actors in the
distributed path, a loop locally); merges handle only per-segment
top-k's, facet partial maps and counts — all small. Facet counting at
scale is the partial+final aggregate pattern (``src/collection.cpp:
821-862``'s shard merge ≙ Ray groupby partials).

Supported search params (reference defaults in parens,
``src/core_api.cpp:252-349``, ``include/collection.h:355-376``):
``filter_by``, ``sort_by`` (≤3 keys, ``_text_match`` pseudo-field),
``facet_by`` + ``max_facet_values`` (10) + ``facet_query`` (with
per-value ``highlighted``), ``page`` (1) / ``per_page`` (10, ≤250),
``group_by`` + ``group_limit`` (3, ≤99),
``include_fields``/``exclude_fields``, exclusion tokens (``-tok``),
drop-tokens fallback (threshold 10), ``num_typos`` + ``prefix`` +
``typo_tokens_threshold`` (100, staged cost expansion) +
``token_order`` (frequency | max_score), synonyms, overrides plus
per-request ``pinned_hits``/``hidden_hits``, highlighting
(``snippet_threshold`` 30, ``highlight_affix_num_tokens`` 4, custom
``highlight_start_tag``/``end_tag``, ``highlight_full_fields``,
multi-field + string[] array highlights).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import numpy as np
import pyarrow as pa

from typesense_ray.filtering import (
    NumericIndexCache,
    StringTokenCache,
    arrow_field_kind,
    eval_filters,
    norm_tokens,
    parse_filter,
)
from typesense_ray.codec import decode_posting_ids
from typesense_ray.index_build import FIELD_SEP
from typesense_ray.query import LocalIndexSearcher, SegmentSearcher
from typesense_ray.scoring import bm25_idf, bm25_term_scores, reference_match_score
from typesense_ray.tokenizer import tokenize_query

SNIPPET_THRESHOLD = 30
HIGHLIGHT_AFFIX = 4
DROP_TOKENS_THRESHOLD = 10
TYPO_TOKENS_THRESHOLD = 100  # reference include/index.h:298
PER_PAGE_MAX = 250
GROUP_LIMIT_MAX = 99


@dataclass
class SortField:
    name: str
    desc: bool = True


def parse_sort_by(sort_by: str | None) -> list[SortField]:
    out = []
    if not sort_by:
        return out
    for piece in sort_by.split(","):
        piece = piece.strip()
        if not piece:
            continue
        if ":" in piece:
            name, order = piece.rsplit(":", 1)
            out.append(SortField(name.strip(), order.strip().lower() != "asc"))
        else:
            out.append(SortField(piece, True))
    if len(out) > 3:
        raise ValueError("sort_by supports at most 3 fields")
    return out


@dataclass
class Override:
    """Curation rule (``include/collection.h:22-94``): when the query
    matches ``rule_query`` (exact or contains), force-include docs at
    fixed positions and/or hide docs. ``rule_id`` keys the collection's
    override store (add_override upserts, remove_override deletes,
    ``src/collection.cpp:2120-2156``)."""

    rule_query: str
    match: str = "exact"  # 'exact' | 'contains'
    includes: list[tuple[int, int]] = dc_field(default_factory=list)  # (doc_id, 1-based pos)
    excludes: list[int] = dc_field(default_factory=list)
    rule_id: str | None = None
    # the user-facing override JSON as PUT over the HTTP surface (string
    # doc ids, not our internal hashed ids) — kept on the rule so a
    # registry save/load round-trip still echoes it from GET /overrides,
    # matching the reference's durable override store
    # (src/collection_manager.cpp load path + core_api.cpp:1078-1188)
    raw: dict | None = None

    def to_view_json(self) -> dict:
        """The GET /overrides representation: the original PUT body when
        we have it, else a synthesized view (internal ids stringified)."""
        if self.raw is not None:
            return self.raw
        return {
            "id": self.rule_id,
            "rule": {"query": self.rule_query, "match": self.match},
            "includes": [{"id": str(d), "position": p}
                         for d, p in self.includes],
            "excludes": [{"id": str(d)} for d in self.excludes],
        }

    def matches(self, query: str) -> bool:
        q = " ".join(norm_tokens(query))
        r = " ".join(norm_tokens(self.rule_query))
        return q == r if self.match == "exact" else (r in q if r else False)


class SynonymIndex:
    """Synonym expansion (``src/collection.cpp:1929-2064``): replaces a
    matching token window with each mapped synonym, producing extra query
    variants searched identically. ``add_synonym(root, synonyms)`` is the
    one-way form; ``add_multiway([a, b, c])`` maps each to the others."""

    def __init__(self):
        self._map: dict[tuple[str, ...], list[tuple[str, ...]]] = {}
        # id → definition, the reference's per-collection synonym store
        # (add_synonym upserts by id, remove_synonym deletes and the
        # index rebuilds, src/collection.cpp:2066-2118)
        self._defs: dict[str, dict] = {}
        self._auto = 0

    def _next_id(self) -> str:
        self._auto += 1
        return f"syn-auto-{self._auto}"

    def add_synonym(self, root: str, synonyms: list[str],
                    syn_id: str | None = None):
        self._defs[syn_id or self._next_id()] = {
            "root": root, "synonyms": list(synonyms)
        }
        self._rebuild()

    def add_multiway(self, phrases: list[str], syn_id: str | None = None):
        self._defs[syn_id or self._next_id()] = {
            "root": None, "synonyms": list(phrases)
        }
        self._rebuild()

    def add_json(self, obj: dict) -> str:
        """Parse-and-upsert in the reference's synonym JSON shape
        (``synonym_t::parse``, error strings included,
        ``test/collection_synonyms_test.cpp:57-145``)."""
        if "id" not in obj:
            raise ValueError("Missing `id` field.")
        syns = obj.get("synonyms")
        if not isinstance(syns, list) or not syns:
            raise ValueError("Could not find an array of `synonyms`")
        if not all(isinstance(s, str) and s for s in syns):
            raise ValueError(
                "Could not find a valid string array of `synonyms`"
            )
        root = obj.get("root")
        if root is not None and not isinstance(root, str):
            raise ValueError("Key `root` should be a string.")
        sid = str(obj["id"])
        self._defs[sid] = {"root": root or None, "synonyms": list(syns)}
        self._rebuild()
        return sid

    def remove_synonym(self, syn_id: str):
        self._defs.pop(syn_id, None)
        self._rebuild()

    def get_synonyms(self) -> dict[str, dict]:
        return {k: dict(v) for k, v in self._defs.items()}

    def get_synonym(self, syn_id: str) -> dict | None:
        d = self._defs.get(syn_id)
        return dict(d) if d else None

    def to_json(self) -> list[dict]:
        """Serialized view (``synonym_t::to_view_json`` role): normalized
        root/synonym token strings under their ids."""
        out = []
        for sid, d in self._defs.items():
            out.append(
                {
                    "id": sid,
                    "root": " ".join(norm_tokens(d["root"]))
                    if d["root"] else "",
                    "synonyms": [
                        " ".join(norm_tokens(s)) for s in d["synonyms"]
                    ],
                }
            )
        return out

    def _rebuild(self):
        self._map = {}
        for d in self._defs.values():
            if d["root"]:
                key = norm_tokens(d["root"])
                bucket = self._map.setdefault(key, [])
                for s in d["synonyms"]:
                    ts = norm_tokens(s)
                    if ts and ts not in bucket:
                        bucket.append(ts)
            else:
                toks = [norm_tokens(p) for p in d["synonyms"]]
                for i, root in enumerate(toks):
                    bucket = self._map.setdefault(root, [])
                    for j, syn in enumerate(toks):
                        if i != j and syn not in bucket:
                            bucket.append(syn)

    def expand(self, tokens: list[str], limit: int = 64) -> list[list[str]]:
        """Query variants (excluding the original) — an exact port of the
        reference's ``synonym_reduction`` recursion
        (``src/collection.cpp:1929-2064``, ported from
        ``test/collection_synonyms_test.cpp`` expectations):

        - longest windows first, and a recursion resumes at the SAME
          window length and start index, so non-overlapping reductions
          compose into ONE variant (``new york t shirt`` → exactly
          ``[nyc, tshirt]``, never the intermediates);
        - a SHARED processed set (window tuples, mapped tuples AND their
          single tokens) stops re-application and reverse application
          (an nyc↔new-york rule pair never ping-pongs);
        - only LEAVES are emitted: a call that recursed anywhere adds no
          result itself; a call with no match and a non-empty processed
          set emits its token list."""
        results: list[list[str]] = []
        processed: set[tuple[str, ...]] = set()

        def internal(toks: list[str], start_window: int, start_idx: int):
            recursed = False
            for wlen in range(start_window, 0, -1):
                si0 = start_idx if wlen == start_window else 0
                for si in range(si0, len(toks) - wlen + 1):
                    window = tuple(toks[si : si + wlen])
                    if window in processed:
                        continue
                    for syn in self._map.get(window, ()):
                        if syn == window:
                            continue  # a multiway member matching itself
                        new_toks = (
                            list(toks[:si]) + list(syn)
                            + list(toks[si + wlen :])
                        )
                        processed.add(window)
                        processed.add(syn)
                        processed.update((t,) for t in window)
                        processed.update((t,) for t in syn)
                        recursed = True
                        if len(results) < limit:
                            internal(new_toks, wlen, si)
            if not recursed and processed:
                results.append(list(toks))

        internal(list(tokens), len(tokens), 0)
        return results[:limit]


def _drop_token_variants_pos(
    tokens: list[str], positions: tuple[int, ...],
) -> list[tuple[list[str], tuple[int, ...]]]:
    """The reference's fallback order (``src/index.cpp:1757-1783``): drop
    from the right until len/2 tokens remain, then drop from the left.
    The recursion there enters while ``num_tokens_dropped < len`` and
    increments first, so the dropped counter runs 1..len — a 2-token
    query yields BOTH single-token variants ([t0] right-drop at 1, [t1]
    left-drop at 2). Each variant carries the surviving tokens'
    ORIGINAL query positions (``positions``, already original when the
    input list was pruned) — the bit indices of the reference's
    per-match token_bits (``src/index.cpp:2037``)."""
    n = len(tokens)
    variants = []
    mid = n // 2
    for dropped in range(1, n + 1):
        if dropped <= mid:
            variants.append(
                (tokens[: n - dropped], tuple(positions[: n - dropped]))
            )
        else:
            start = dropped - mid
            if start >= n:
                continue
            variants.append((tokens[start:], tuple(positions[start:])))
    return variants


def _drop_token_variants(
    tokens: list[str],
) -> list[tuple[list[str], tuple[int, ...]]]:
    return _drop_token_variants_pos(tokens, tuple(range(len(tokens))))


class RayCollection:
    def __init__(
        self,
        index_dir: str,
        default_sorting_field: str | None = None,
        preload: bool = False,
        synonyms: SynonymIndex | None = None,
        overrides: list[Override] | None = None,
    ):
        self._local = LocalIndexSearcher(index_dir, preload=preload)
        self.stats = self._local.stats
        self.segments: list[SegmentSearcher] = self._local.segments
        self.default_sorting_field = default_sorting_field
        self.synonyms = synonyms or SynonymIndex()
        self.overrides = overrides or []
        self._token_caches = [StringTokenCache() for _ in self.segments]
        # sorted numeric sidecars (num_tree role) per segment, built lazily
        self._num_caches = [NumericIndexCache() for _ in self.segments]
        # per-field GLOBAL filter-token vocabulary (the ART-leaf-exists
        # probe of src/index.cpp:1036-1043), built lazily per field
        self._filter_vocabs: dict[str, frozenset] = {}
        self._typo_resolver = None
        self._avgdl_cache: dict[str, float] = {}
        schema = self.segments[0].docs.schema if self.segments else pa.schema([])
        self.field_types = {
            name: arrow_field_kind(schema.field(name).type) for name in schema.names
        }
        self._list_fields = {
            name for name in schema.names
            if pa.types.is_list(schema.field(name).type)
            or pa.types.is_large_list(schema.field(name).type)
        }
        # default sorting field validation mirrors the reference's
        # create_collection errors (test/collection_sorting_test.cpp:
        # 121-143): must exist and be a single-valued numerical field
        if default_sorting_field is not None and schema.names:
            if default_sorting_field not in self.field_types:
                raise ValueError(
                    f"Default sorting field is defined as "
                    f"`{default_sorting_field}` but is not found in the "
                    f"schema."
                )
            ftype = schema.field(default_sorting_field).type
            if (self.field_types[default_sorting_field]
                    not in ("int", "float")
                    or pa.types.is_list(ftype)
                    or pa.types.is_large_list(ftype)):
                raise ValueError(
                    f"Default sorting field `{default_sorting_field}` "
                    f"must be a single valued numerical field."
                )

    # -- override store (reference add/remove/get_overrides,
    # src/collection.cpp:2120-2156) ----------------------------------------

    def add_override(self, ov: Override):
        """Upsert by ``rule_id`` (same-id rules replace); id-less rules
        just append."""
        if ov.rule_id is not None:
            self.overrides = [
                o for o in self.overrides if o.rule_id != ov.rule_id
            ]
        self.overrides.append(ov)

    def remove_override(self, rule_id: str):
        self.overrides = [o for o in self.overrides if o.rule_id != rule_id]

    def get_overrides(self) -> dict[str, Override]:
        return {o.rule_id: o for o in self.overrides
                if o.rule_id is not None}

    def _pin_id(self, raw: str) -> int | None:
        """A pinned/hidden id string → internal doc id: raw int for
        integer-keyed collections; hashed user key for string-keyed ones
        (ids may themselves contain ':' — the reference splits
        pinned_hits on the LAST colon,
        test/collection_override_test.cpp:569-614)."""
        raw = raw.strip()
        id_field = self.stats["config"].get("id_field")
        if id_field and self.field_types.get(id_field) == "str":
            from typesense_ray.index_build import doc_id_from_key

            return doc_id_from_key(raw)
        try:
            return int(raw)
        except ValueError:
            return None

    def _string_filter_vocab(self, field: str) -> frozenset:
        """Union of a string field's normalized tokens across ALL
        segments — the global term-exists probe for filter-token
        skipping (see :func:`~typesense_ray.filtering.eval_filters`).
        Tokenization reuses the per-segment caches the contains-filter
        path builds anyway, so this adds one set-union per field per
        collection lifetime."""
        vocab = self._filter_vocabs.get(field)
        if vocab is None:
            s: set[str] = set()
            for si, seg in enumerate(self.segments):
                toks = self._token_caches[si].get(seg.docs, field)
                if toks and isinstance(toks[0], list):
                    for row in toks:
                        for tup in row:
                            s.update(tup)
                else:
                    for tup in toks:
                        s.update(tup)
            vocab = self._filter_vocabs[field] = frozenset(s)
        return vocab

    @property
    def typo_resolver(self):
        if self._typo_resolver is None:
            from typesense_ray.typo import TypoResolver

            self._typo_resolver = TypoResolver(self._local.index_dir)
        return self._typo_resolver

    # -- scoring helpers ---------------------------------------------------

    def _dfs(self, terms):
        return self._local._dfs(list(terms))

    def _score_bm25(self, seg: SegmentSearcher, cand, post, terms,
                    dl_col=None, avgdl=None):
        scores = np.zeros(cand.size, dtype=np.float64)
        if terms != ["*"] and cand.size:
            dl = (dl_col if dl_col is not None else seg.doclen)[cand]
            avgdl = avgdl if avgdl is not None else self.stats["avgdl"]
            dfs = self._dfs([t for t in set(terms)])
            for t in sorted(set(terms)):
                p = post[t]
                idx = np.searchsorted(p["ids"], cand)
                tf = p["tfs"][idx]
                idf = float(bm25_idf(dfs[t], self.stats["n_docs"]))
                scores += bm25_term_scores(
                    tf, dl, idf, avgdl, self.stats["k1"], self.stats["b"]
                )
        return scores

    def _field_avgdl(self, field: str) -> float:
        key = f"avgdl::{field}"
        cached = self._avgdl_cache.get(key)
        if cached is None:
            col = f"dl__{field}"
            tot = sum(
                int(np.sum(seg.docs[col].to_numpy())) for seg in self.segments
                if col in seg.docs.column_names
            )
            cached = self._avgdl_cache[key] = (
                tot / self.stats["n_docs"] if self.stats["n_docs"] else 0.0
            )
        return cached

    def _score_reference(self, seg: SegmentSearcher, cand, post, terms, cost=0):
        if terms == ["*"]:
            return np.zeros(cand.size, dtype=np.int64)
        if len(terms) <= 1:
            return np.full(
                cand.size, reference_match_score([None], cost), dtype=np.int64
            )
        perterm = seg.term_positions_for(post, cand)
        ordered = [perterm[t] for t in terms]
        return np.fromiter(
            (
                reference_match_score([tp[i] for tp in ordered], cost)
                for i in range(cand.size)
            ),
            dtype=np.int64,
            count=cand.size,
        )

    def _prune_tokens(self, tokens, field, num_typos, prefix):
        """Tokens that have SOME candidate in this field's vocabulary,
        with their original query positions — the reference erases
        no-candidate tokens from the field's query before matching
        ('we can try to drop the token and search with remaining
        tokens', ``src/index.cpp:1722-1731``), which is what lets
        'Dustin Kensrue Down There by the Train' match title-only and
        artist-only docs per field."""
        from typesense_ray.index_build import FIELD_SEP

        tr = self.typo_resolver
        pre = field + FIELD_SEP if field else ""
        kept: list[str] = []
        pos: list[int] = []
        for i, t in enumerate(tokens):
            is_last = i == len(tokens) - 1
            known = (pre + t) in tr._term_index
            if not known and is_last and prefix:
                known = bool(tr.prefix(t, max_candidates=1, field=field))
            if not known and num_typos > 0:
                known = bool(
                    tr.fuzzy(t, num_typos, max_candidates=1, field=field)
                )
            if known:
                kept.append(t)
                pos.append(i)
        return kept, tuple(pos)

    def _field_variants(self, include, num_typos, prefix, token_order,
                        exp_fields):
        """Stage-0 search variants: per queried field, the unknown-token
        PRUNED query (original positions kept) run through that field's
        typo/prefix expansion; deduped union across fields. Also returns
        the per-field pruned lists (the drop-tokens recursion operates on
        those, per reference ``search_field``)."""
        order = "max_score" if token_order == "max_score" else "common"
        stage0: list[tuple[list[str], int, tuple[int, ...]]] = []
        seen: set = set()
        pruned_by_field: dict = {}
        for f in exp_fields:
            pl, pp = self._prune_tokens(include, f, num_typos, prefix)
            if not pl:
                # nothing known in this field: no stage-0 variant, but the
                # drop-tokens recursion still probes the ORIGINAL tokens
                # (documented divergence from the reference's all-erased →
                # zero-hits path: 'math fx' + prefix drops 'fx' and then
                # prefix-expands 'math', see test_prefix_searching)
                pruned_by_field[f] = (
                    list(include), tuple(range(len(include)))
                )
                continue
            pruned_by_field[f] = (pl, pp)
            if num_typos > 0 or prefix:
                exp = self.typo_resolver.expand_query(
                    pl, num_typos=num_typos, prefix_last=prefix,
                    order=order, field=f,
                )
                vs = ([(t, c, pp, sc) for t, c, sc in exp] if exp
                      else [(pl, 0, pp, 0)])
            else:
                vs = [(pl, 0, pp, 0)]
            for v in vs:
                key = (tuple(v[0]), v[1], v[2])
                if key not in seen:
                    seen.add(key)
                    stage0.append(v)
        return stage0, pruned_by_field

    def _expand_variants(self, tokens, num_typos, prefix, token_order,
                         exp_fields):
        """Typo/prefix query expansion UNIONED across the query's fields
        (None = primary): the reference runs ``search_field`` per
        query_by field, each expanding candidates in that field's own
        ART tree (``src/index.cpp:1461-1470``); here the union of
        per-field variants is evaluated against every field (a variant
        foreign to a field simply finds no postings there). Dedup keeps
        the lowest cost per term-list."""
        order = "max_score" if token_order == "max_score" else "common"
        best: dict[tuple, tuple[int, int]] = {}
        ordered: list[tuple] = []
        for f in exp_fields:
            for t, c, sc in self.typo_resolver.expand_query(
                tokens, num_typos=num_typos, prefix_last=prefix,
                order=order, field=f,
            ):
                key = tuple(t)
                if key not in best:
                    ordered.append(key)
                    best[key] = (c, sc)
                elif (c, sc) < best[key]:
                    best[key] = (c, sc)
        return [(list(k), *best[k]) for k in ordered]

    # -- main entry --------------------------------------------------------

    def search(
        self,
        q: str,
        *,
        mode: str = "bm25",
        filter_by: str = "",
        sort_by: str | None = None,
        facet_by: str = "",
        facet_query: str = "",
        max_facet_values: int = 10,
        page: int = 1,
        per_page: int = 10,
        group_by: str = "",
        group_limit: int = 3,
        include_fields: list[str] | None = None,
        exclude_fields: list[str] | None = None,
        drop_tokens_threshold: int = DROP_TOKENS_THRESHOLD,
        typo_tokens_threshold: int = TYPO_TOKENS_THRESHOLD,
        highlight: bool = True,
        pinned_hits: str = "",
        hidden_hits: str = "",
        highlight_full_fields: str = "",
        snippet_threshold: int = SNIPPET_THRESHOLD,
        highlight_affix_num_tokens: int = HIGHLIGHT_AFFIX,
        highlight_start_tag: str = "<mark>",
        highlight_end_tag: str = "</mark>",
        text_field: str | None = None,
        use_synonyms: bool = True,
        num_typos: int = 0,
        prefix: bool = False,
        token_order: str = "frequency",  # 'frequency' | 'max_score'
        query_by: list[str] | None = None,
        query_by_weights: list[int] | None = None,
        max_hits: int = 250,
    ) -> dict:
        # window validation errors mirror the reference's 422 Options
        # (src/collection.cpp:532-543; CollectionTest.
        # KeywordQueryReturnsResultsBasedOnPerPageParam)
        if per_page > PER_PAGE_MAX:
            raise ValueError(
                f"Only upto {PER_PAGE_MAX} hits can be fetched per page."
            )
        if page < 1:
            raise ValueError(
                "Page must be an integer of value greater than 0."
            )
        # weights must pair 1:1 with query_by fields
        # (src/collection.cpp:585-590; CollectionTest.FieldWeightsNotProper)
        if query_by_weights:
            n_fields = len(query_by) if query_by else 1
            if len(query_by_weights) != n_fields:
                raise ValueError(
                    "Number of weights in `query_by_weights` does not "
                    "match number of `query_by` fields."
                )
        if group_by and not 1 <= group_limit <= GROUP_LIMIT_MAX:
            raise ValueError(
                f"Value of `group_limit` must be between 1 and "
                f"{GROUP_LIMIT_MAX}."
            )
        # result-window cap (src/collection.cpp:746-751): single-field /
        # wildcard queries fetch exactly the requested window; multi-field
        # queries cap the window at max_hits (the reference truncates the
        # result window at min(max_hits, num_documents), so deep pagination
        # past max_hits yields no extra hits)
        if (not query_by or len(query_by) <= 1) or q == "*":
            fetch_k = page * per_page
        else:
            fetch_k = max_hits
        hl_opts = {
            "snippet_threshold": snippet_threshold,
            "affix_tokens": highlight_affix_num_tokens,
            "start_tag": highlight_start_tag,
            "end_tag": highlight_end_tag,
        }
        hl_full = {f.strip() for f in highlight_full_fields.split(",")
                   if f.strip()}
        hl_fields = list(query_by) if query_by else None

        include, exclude = tokenize_query(q)
        # typo/prefix candidates come from EACH queried field's own
        # vocabulary (the reference expands in every query_by field's ART
        # tree, src/index.cpp:1461-1470) — a prefix that only completes in
        # a secondary field must still expand
        _primary = self.stats["config"]["text_field"]
        exp_fields = [
            None if f == _primary else f for f in (query_by or [_primary])
        ]
        # variants are (terms, cost, original-query-positions, score_cost);
        # positions feed the reference's per-match token_bits
        # (src/index.cpp:2037); score_cost adds the reference's
        # length-mismatch penalty (next_suggestion, src/index.cpp:2040)
        variants: list[tuple[list[str], int, tuple[int, ...], int]] = [
            (include, 0, tuple(range(len(include))), 0)
        ]
        pruned_by_field: dict = {
            f: (include, tuple(range(len(include)))) for f in exp_fields
        }
        if include != ["*"]:
            stage0, pruned_by_field = self._field_variants(
                include, num_typos, prefix, token_order, exp_fields
            )
            variants = stage0  # empty when no field knows any token
        if use_synonyms and include != ["*"]:
            # the reference re-enters search_field for each synonym variant
            # with the SAME num_typos/prefix (src/index.cpp:1478-1487), so
            # each expanded variant goes through typo/prefix expansion too —
            # a typo'd or prefixed form of a synonym term still matches
            for v in self.synonyms.expand(include):
                if num_typos > 0 or prefix:
                    exp_syn = self._expand_variants(
                        v, num_typos, prefix, token_order, exp_fields
                    )
                    if exp_syn:
                        variants += [
                            (t, c, tuple(range(len(t))), sc)
                            for t, c, sc in exp_syn
                        ]
                        continue
                variants.append((v, 0, tuple(range(len(v))), 0))

        # malformed filters yield ZERO hits rather than an error on the
        # search path (the reference swallows unknown fields and
        # unparseable values into empty results,
        # test/collection_filtering_test.cpp:156-209); the destructive
        # paths (matching_ids → delete_by_filter) keep raising
        try:
            clauses = (
                parse_filter(filter_by, self.field_types)
                if filter_by
                else []
            )
        except (KeyError, ValueError):
            return {
                "page": page, "out_of": self.stats["n_docs"],
                "request_params": {"q": q}, "found": 0, "hits": [],
            }
        facet_fields = [f.strip() for f in facet_by.split(",") if f.strip()]
        # facet param validation errors mirror the reference's error
        # Options (test/collection_faceting_test.cpp:429-472) — unlike
        # malformed filter_by, which swallows into zero hits
        for f in facet_fields:
            if f not in self.field_types:
                raise ValueError(
                    f"Could not find a facet field named `{f}` in the schema."
                )
        if facet_query:
            if ":" not in facet_query:
                raise ValueError(
                    "Facet query must be in the `facet_field: value` format."
                )
            if not facet_fields:
                raise ValueError(
                    "The `facet_query` parameter is supplied without a "
                    "`facet_by` parameter."
                )
            _fqf = facet_query.split(":", 1)[0].strip()
            if _fqf not in facet_fields:
                raise ValueError(
                    f"Facet query refers to a facet field `{_fqf}` that "
                    f"is not part of `facet_by` parameter."
                )
        group_fields = [f.strip() for f in group_by.split(",") if f.strip()]
        sort_fields = parse_sort_by(sort_by)
        # explicit sort fields must be single-valued numerical schema
        # fields — the reference's sort_schema holds only those, so array
        # fields, strings and unknown names all yield the same 404
        # (CollectionTest.SearchingWithMissingFields)
        for sf in sort_fields:
            if sf.name == "_text_match" or not self.segments:
                continue  # an empty index has no schema to validate against
            if (sf.name not in self.field_types
                    or self.field_types[sf.name] not in ("int", "float")
                    or sf.name in self._list_fields):
                raise ValueError(
                    f"Could not find a field named `{sf.name}` in the "
                    f"schema for sorting."
                )
        if not sort_fields:
            sort_fields = [SortField("_text_match", True)]
            if self.default_sorting_field:
                sort_fields.append(SortField(self.default_sorting_field, True))

        if query_by and self.segments:
            primary = self.stats["config"]["text_field"]
            indexed = set(self.stats["config"].get("indexed_fields") or ())
            for f in query_by:
                # reference 404/400 Options (src/collection.cpp:551-563;
                # CollectionTest.SearchingWithMissingFields)
                if f not in self.field_types and f != primary:
                    raise ValueError(
                        f"Could not find a field named `{f}` in the schema."
                    )
                if self.field_types.get(f, "str") != "str":
                    raise ValueError(
                        f"Field `{f}` should be a string or a string array."
                    )
                if f != primary and f not in indexed:
                    raise KeyError(
                        f"query_by field {f!r} is not indexed "
                        f"(text_field={primary!r}, indexed_fields={sorted(indexed)})"
                    )
        multi = bool(
            query_by
            and (len(query_by) > 1
                 or query_by[0] != self.stats["config"]["text_field"])
        )

        def eval_seg(seg, variant_list, mask):
            if multi:
                # reference default weights: n..1 by field order
                # (src/collection.cpp:593-597)
                return self._search_segment_multi(
                    seg, variant_list, exclude, mask, mode, query_by,
                    query_by_weights or list(range(len(query_by), 0, -1)),
                    include,
                )
            return self._search_segment(seg, variant_list, exclude, mask, mode)

        # per-segment evaluation (the distributed path runs this block
        # inside IndexServer actors / search_index tasks; locally a loop),
        # STAGED by typo cost: higher-cost variants are only evaluated
        # while accumulated results stay under ``typo_tokens_threshold``
        # (the reference stops expanding once a cost level has enough,
        # src/index.cpp search_field / include/index.h:298)
        masks = [
            (
                eval_filters(seg.docs, clauses, self.field_types,
                             self._token_caches[si], self._num_caches[si],
                             vocab_fn=self._string_filter_vocab)
                if clauses
                else None
            )
            for si, seg in enumerate(self.segments)
        ]
        by_cost: dict[int, list] = {}
        for v in variants:
            by_cost.setdefault(v[1], []).append(v)
        seg_results: list = [None] * len(self.segments)
        total_found = 0
        used_variants: list = []
        for li, cost in enumerate(sorted(by_cost)):
            if li > 0 and total_found >= typo_tokens_threshold:
                break
            level = by_cost[cost]
            used_variants += level
            for si, seg in enumerate(self.segments):
                res = eval_seg(seg, level, masks[si])
                seg_results[si] = (
                    res
                    if seg_results[si] is None
                    else _merge_seg_results(seg_results[si], res)
                )
            total_found = sum(r["cand"].size for r in seg_results)
        for si in range(len(self.segments)):
            if seg_results[si] is None:  # no variant at all (all unknown)
                seg_results[si] = {"cand": np.empty(0, np.int64),
                                   "score": np.empty(0, np.float64)}

        # drop-tokens fallback: too few results and a multi-token query →
        # retry with truncated token lists, merging (dedup keeps best).
        # The reference's recursion re-enters search_field with the SAME
        # num_typos (src/index.cpp:1779-1783) over each field's PRUNED
        # token list, so truncated variants carry original positions and
        # go through the same per-field typo/prefix expansion here.
        fallback_used = False
        if total_found < drop_tokens_threshold and len(include) > 1:
            drop_plan: list[tuple[list[str], tuple[int, ...], object]] = []
            seen_drop: set = set()
            for f, (pl, pp) in pruned_by_field.items():
                if len(pl) < 2:
                    continue
                for truncated, tpos in _drop_token_variants_pos(pl, pp):
                    key = (tuple(truncated), tpos)
                    if key not in seen_drop:
                        seen_drop.add(key)
                        drop_plan.append((truncated, tpos, f))
            for truncated, tpos, f in drop_plan:
                if num_typos > 0 or prefix:
                    exp2 = self.typo_resolver.expand_query(
                        truncated, num_typos=num_typos, prefix_last=prefix,
                        order=("max_score" if token_order == "max_score"
                               else "common"),
                        field=f,
                    )
                    drop_vars = (
                        [(t, c, tpos, sc) for t, c, sc in exp2]
                        if exp2
                        else [(truncated, 0, tpos, 0)]
                    )
                else:
                    drop_vars = [(truncated, 0, tpos, 0)]
                fallback_used = True
                used_variants += drop_vars
                for si, seg in enumerate(self.segments):
                    res2 = eval_seg(seg, drop_vars, masks[si])
                    seg_results[si] = _merge_seg_results(seg_results[si], res2)
                total_found = sum(r["cand"].size for r in seg_results)
                if total_found >= drop_tokens_threshold:
                    break

        # multi-field cross-field aggregation (weighted sum + token_bits
        # popcount) must see ALL evaluated variants together — incremental
        # merges keep only the best single-call score per doc, losing
        # cross-stage field combinations; re-evaluate once at the end
        if multi and fallback_used:
            for si, seg in enumerate(self.segments):
                seg_results[si] = eval_seg(seg, used_variants, masks[si])

        # highlight with every term any EVALUATED variant searched (so
        # typo/prefix/synonym matches get marked, not just verbatim
        # query tokens — and skipped cost levels don't leak in)
        highlight_terms = sorted(
            {t for terms, *_ in used_variants for t in terms if t != "*"}
        )

        # hidden/pinned curation
        # stored overrides + per-request pinned_hits/hidden_hits params
        # ("id:pos,..." / "id,..."); the params take precedence — a doc
        # hidden by the request is never re-included by an override rule
        # (test/collection_override_test.cpp:327-350)
        hidden: set[int] = set()
        pinned: list[tuple[int, int]] = []
        # malformed pieces are skipped, matching the search path's
        # swallow-malformed-filters behavior — one bad curation param must
        # not turn a search into an exception
        if hidden_hits:
            for x in hidden_hits.split(","):
                x = x.strip()
                if x:
                    did = self._pin_id(x)
                    if did is not None:
                        hidden.add(did)
        if pinned_hits:
            for piece in pinned_hits.split(","):
                piece = piece.strip()
                if piece:
                    try:
                        # LAST colon: user ids may contain ':' (URLs)
                        did_s, pos_s = piece.rsplit(":", 1)
                        did = self._pin_id(did_s)
                        if did is not None:
                            pinned.append((int(pos_s), did))
                    except ValueError:
                        continue
        for ov in self.overrides:
            if ov.matches(q):
                hidden |= set(ov.excludes)
                pinned += [(pos, did) for (did, pos) in ov.includes]
        # a doc pinned by several rules keeps its first pin; hidden wins
        seen_doc: set[int] = set()
        pins_all: list[tuple[int, int]] = []
        for pos, did in pinned:
            if did in hidden or did in seen_doc:
                continue
            seen_doc.add(did)
            pins_all.append((pos, did))
        # ungrouped view: ONE doc per position — the FIRST rule in
        # request-then-override order wins, later same-position ids keep
        # their organic spots (test/collection_override_test.cpp:471-486);
        # the GROUPED path instead gathers same-position pins into one
        # group (ibid. :489-523), so it consumes pins_all
        seen_pos: set[int] = set()
        pinned = []
        for pos, did in pins_all:
            if pos in seen_pos:
                continue
            seen_pos.add(pos)
            pinned.append((pos, did))

        # rank candidates per segment by the sort spec, keep fetch_k each
        ranked_parts = []
        for seg, res in zip(self.segments, seg_results):
            part = self._rank_segment(seg, res, sort_fields, mode, fetch_k, group_fields)
            if part is not None:
                ranked_parts.append(part)

        merged = _merge_ranked(ranked_parts, hidden)

        # facets over ALL matched docs (not just top-k), merged partials
        facet_counts = []
        if facet_fields:
            # curated (pinned/included) docs count in facets too — the
            # reference facets over the final result set
            # (test/collection_override_test.cpp:171-200)
            pin_locals: list[list[int]] | None = None
            if pins_all:
                pin_locals = [[] for _ in self.segments]
                for _pos, did in pins_all:
                    for si, seg in enumerate(self.segments):
                        j = int(np.searchsorted(seg.doc_ids,
                                                np.uint64(did)))
                        if j < seg.n_docs and int(seg.doc_ids[j]) == did:
                            pin_locals[si].append(j)
                            break
            facet_counts = self._facets(
                seg_results, facet_fields, max_facet_values, group_fields,
                facet_query, hidden, pin_locals,
            )

        out_of = self.stats["n_docs"]
        response: dict = {"page": page, "out_of": out_of, "request_params": {"q": q}}

        if group_fields:
            groups = self._group_with_pins(
                merged, group_fields, group_limit, pins_all
            )
            response["found"] = len(groups)
            start = (page - 1) * per_page
            page_groups = groups[start : start + per_page]
            response["grouped_hits"] = [
                {
                    "group_key": list(gk),
                    "hits": self._hits(rows, highlight_terms, mode, include_fields,
                                       exclude_fields, highlight, text_field,
                                       hl_opts, hl_fields, hl_full),
                }
                for gk, rows in page_groups
            ]
        else:
            found = sum(r["cand"].size for r in seg_results)
            if hidden:
                found -= sum(
                    int(np.isin(seg.doc_ids[res["cand"]],
                                np.array(sorted(hidden), dtype=np.uint64)).sum())
                    for seg, res in zip(self.segments, seg_results)
                )
            # weave pinned hits at fixed positions (src/collection.cpp:897-922)
            rows = merged[: fetch_k]
            if pinned:
                rows = self._weave_pinned(rows, pinned, fetch_k)
                found += sum(
                    1 for _, did in pinned
                    if not any(r["doc_id"] == did for r in merged)
                )
            response["found"] = found
            start = (page - 1) * per_page
            response["hits"] = self._hits(
                rows[start : start + per_page], highlight_terms, mode,
                include_fields, exclude_fields, highlight, text_field,
                hl_opts, hl_fields, hl_full,
            )

        if facet_counts:
            response["facet_counts"] = facet_counts
        return response

    def get_document(self, *key_parts, columns=None):
        """Point lookup by the identifying key fields (string user id →
        internal id, src/collection.cpp:1659-1672): hash the key the same
        way the build did, then hydrate from the owning segment."""
        from typesense_ray.index_build import doc_id_from_key

        if len(key_parts) == 1 and isinstance(key_parts[0], int):
            did = key_parts[0]
        else:
            did = doc_id_from_key(*[str(p) for p in key_parts])
        tbl = self._local.hydrate(np.array([did], dtype=np.uint64), columns)
        return None if tbl is None or tbl.num_rows == 0 else tbl.to_pylist()[0]

    def phrase_ids(self, phrase: str) -> pa.Table:
        """All doc_ids containing ``phrase`` as strictly consecutive tokens
        (positional-index phrase match), sorted ascending."""
        return self._local.phrase_match(phrase)

    def matching_ids(
        self,
        q: str,
        filter_by: str = "",
        *,
        query_by: list[str] | None = None,
        num_typos: int = 0,
        apply_synonyms: bool = False,
        apply_overrides: bool = False,
    ) -> pa.Table:
        """All matching doc_ids for a query+filter (no top-k cap) — the
        export / bulk-delete-resolution path (``src/core_api.cpp:880-985``
        resolves filter matches the same way before deleting).

        ``query_by`` unions conjunctive matches across fields (a doc hits
        when SOME field contains every query token); ``num_typos`` resolves
        each token to its UNCAPPED candidate-term set (every vocabulary
        term within bounded OSA distance) and a doc hits when it contains
        some candidate per token — the id-set view of fuzzy search, exactly
        the ``damerau_levenshtein`` oracle's semantics (unlike the top-k
        path, which applies the reference's 3-candidate/10-combination
        caps, ``src/index.cpp:1673-1755``).

        ``apply_synonyms`` unions the id sets of every synonym-expanded
        query variant (the reference searches variants identically,
        ``src/collection.cpp:767-787``); ``apply_overrides`` applies
        matching curation rules' include/exclude ids to the final set
        (``src/collection.cpp:532-588``). Both are the id-set view of the
        corresponding ``search`` features."""
        primary = self.stats["config"]["text_field"]
        include, exclude = tokenize_query(q)
        variants = [include]
        if apply_synonyms and include != ["*"]:
            variants += self.synonyms.expand(include)
        if num_typos and include and include != ["*"]:
            # fuzzy path: EVERY synonym-expanded variant gets its own
            # per-token candidate-term sets (the reference runs each
            # variant through the same fuzzy search,
            # src/collection.cpp:767-787); variant id sets union below
            token_terms_variants = []
            for inc in variants:
                per_token = self.typo_resolver.candidates_per_token(
                    inc, num_typos
                )
                if per_token:
                    token_terms_variants.append(
                        [[t for t, _ in cands] for cands in per_token]
                    )
            if not token_terms_variants:
                return pa.table({"doc_id": pa.array([], pa.int64())})
        else:
            token_terms_variants = None  # exact terms, conjunctive
        fields = query_by or [primary]
        clauses = parse_filter(filter_by, self.field_types) if filter_by else []
        ids = []
        for si, seg in enumerate(self.segments):
            mask = (
                eval_filters(seg.docs, clauses, self.field_types,
                             self._token_caches[si], self._num_caches[si],
                             vocab_fn=self._string_filter_vocab)
                if clauses
                else None
            )
            acc: np.ndarray | None = None
            # exclude tokens ban the doc if present in ANY queried field
            pexcl = [
                (t if f == primary else f + FIELD_SEP + t)
                for f in fields for t in exclude
            ]
            for field in fields:
                pref = (lambda t: t) if field == primary else (
                    lambda t, f=field: f + FIELD_SEP + t
                )
                if token_terms_variants is None:
                    cand = None
                    for inc in variants:
                        pterms = (
                            inc if inc == ["*"] else [pref(t) for t in inc]
                        )
                        c, _ = seg.candidates(pterms, pexcl, mask, False)
                        if c.size:
                            cand = c if cand is None else np.union1d(cand, c)
                    if cand is None:
                        cand = np.empty(0, np.int64)
                else:
                    # per token: union of candidate-term postings; across
                    # tokens: intersection (some-candidate-per-token);
                    # across synonym variants: union of the id sets
                    cand = None
                    for token_terms in token_terms_variants:
                        vcand = None
                        for cands in token_terms:
                            post = seg.postings([pref(t) for t in cands])
                            if not post:
                                vcand = np.empty(0, np.int64)
                                break
                            tok_ids = np.unique(
                                np.concatenate(
                                    [
                                        decode_posting_ids(
                                            p["ids_vb"], p["df"]
                                        ).astype(np.int64)
                                        for p in post.values()
                                    ]
                                )
                            )
                            vcand = (
                                tok_ids
                                if vcand is None
                                else np.intersect1d(
                                    vcand, tok_ids, assume_unique=True
                                )
                            )
                            if vcand.size == 0:
                                break
                        if vcand is not None and vcand.size:
                            cand = (
                                vcand
                                if cand is None
                                else np.union1d(cand, vcand)
                            )
                    if cand is None:
                        cand = np.empty(0, np.int64)
                    if cand.size and pexcl:
                        ex = seg.postings(pexcl)
                        for p in ex.values():
                            cand = np.setdiff1d(
                                cand,
                                decode_posting_ids(p["ids_vb"], p["df"]).astype(
                                    np.int64
                                ),
                                assume_unique=True,
                            )
                    if cand.size and mask is not None:
                        cand = cand[mask[cand]]
                if cand.size:
                    acc = cand if acc is None else np.union1d(acc, cand)
            if acc is not None and acc.size:
                ids.append(seg.doc_ids[acc])
        all_ids = (
            np.sort(np.concatenate(ids)) if ids else np.empty(0, np.uint64)
        )
        out = all_ids.astype(np.int64)
        if apply_overrides and self.overrides:
            inc_ids: list[int] = []
            exc_ids: list[int] = []
            for ov in self.overrides:
                if ov.matches(q):
                    inc_ids += [int(d) for d, _ in ov.includes]
                    exc_ids += [int(d) for d in ov.excludes]
            if inc_ids:
                out = np.union1d(out, np.array(inc_ids, np.int64))
            if exc_ids:
                out = np.setdiff1d(out, np.array(exc_ids, np.int64))
        return pa.table({"doc_id": pa.array(out, pa.int64())})

    # -- internals ---------------------------------------------------------

    def _search_segment(self, seg, variants, exclude, mask, mode):
        """Evaluate all (terms, cost) query variants on one segment; dedup
        docs keeping the best score (the reference Topster's kv_map
        behavior, ``include/topster.h:168-213``). Single-variant queries
        (the common no-typo/no-synonym path) skip the dedup entirely;
        multi-variant dedup is one vectorized maximum.reduceat over the
        concatenated (cand, score) arrays — no per-candidate Python loop
        either way."""
        parts: list[tuple[np.ndarray, np.ndarray]] = []
        for terms, _cost, _pos, scost in variants:
            cand, post = seg.candidates(terms, exclude, mask, True)
            if cand.size == 0:
                continue
            if mode == "bm25":
                scores = self._score_bm25(seg, cand, post, terms)
            else:
                scores = self._score_reference(seg, cand, post, terms, scost)
            parts.append((cand.astype(np.int64), scores.astype(np.float64)))
        if not parts:
            return {"cand": np.empty(0, np.int64),
                    "score": np.empty(0, np.float64)}
        if len(parts) == 1:
            return {"cand": parts[0][0], "score": parts[0][1]}
        return _dedup_best(
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
        )

    def _search_segment_multi(self, seg, variants, exclude, mask, mode,
                              fields, weights, q_tokens):
        """Multi-field search (``query_by`` list): per field, evaluate all
        variants against that field's (prefixed) postings and keep the
        best (score, token_bits) per doc per field, then aggregate the
        reference's cross-field score (``src/index.cpp:1495-1593``):

        - weighted SUM of each matched field's best match score
          (weights default n..1, ``src/collection.cpp:593-597``),
        - for fields the doc did NOT fully match, a 0-typo per-token
          probe that still credits matched tokens — ``words_present``
          occurrences → ``Match::get_match_score(wp, 0, 100)`` × weight
          (``src/index.cpp:1543-1583``),
        - token_bits (bit 31 + the matched tokens' original query
          positions, ``src/index.cpp:1513,2037``) ORed across fields,
          popcount packed into bits 48+ of the aggregate so
          distinct-query-token coverage dominates (``src/index.cpp:
          1586``).

        The packed popcount aggregation applies in reference mode (the
        reference's integer score packing) with >1 field; bm25 mode keeps
        the weighted float sum of per-field BM25 — our scoring model,
        where token coverage is already idf/tf-weighted."""
        primary = self.stats["config"]["text_field"]
        ref_multi = mode != "bm25" and len(fields) > 1
        # an excluded token bans the doc if it appears in ANY query_by
        # field, not just the one being evaluated (the reference resolves
        # exclude tokens across every search field before scoring,
        # CollectionTest.MultiFieldRelevance's "-downie" case)
        all_excl = [
            (t if f == primary else f + FIELD_SEP + t)
            for f in fields for t in exclude
        ]
        fld_fis: list[int] = []
        fld_cands: list[np.ndarray] = []
        fld_scores: list[np.ndarray] = []
        fld_bits: list[np.ndarray] = []
        prefs = []
        for fi, field in enumerate(fields):
            pref = (lambda t: t) if field == primary else (
                lambda t, f=field: f + FIELD_SEP + t
            )
            prefs.append(pref)
            dl_col = None
            avgdl = None
            if field != primary:
                col = f"dl__{field}"
                if col in seg.docs.column_names:
                    dl_col = seg.docs[col].to_numpy().astype(np.int64)
                    avgdl = self._field_avgdl(field)
            parts: list[tuple[np.ndarray, np.ndarray]] = []
            part_bits: list[np.ndarray] = []
            part_vidx: list[np.ndarray] = []
            for vi, (terms, _cost, positions, scost) in enumerate(variants):
                pterms = terms if terms == ["*"] else [pref(t) for t in terms]
                cand, post = seg.candidates(pterms, all_excl, mask, True)
                if cand.size == 0:
                    continue
                if mode == "bm25":
                    scores = self._score_bm25(seg, cand, post, pterms, dl_col, avgdl)
                else:
                    scores = self._score_reference(seg, cand, post, pterms, scost)
                parts.append(
                    (cand.astype(np.int64), scores.astype(np.float64))
                )
                vbits = (1 << 31) | sum(1 << p for p in positions)
                part_bits.append(np.full(cand.size, vbits, dtype=np.int64))
                part_vidx.append(np.full(cand.size, vi, dtype=np.int64))
            if not parts:
                continue
            cand = np.concatenate([p[0] for p in parts])
            score = np.concatenate([p[1] for p in parts])
            bits = np.concatenate(part_bits)
            vidx = np.concatenate(part_vidx)
            # best variant per doc for this field (topster kv_map role):
            # max score, first variant on ties, carrying its token_bits
            order = np.lexsort((-vidx, score, cand))
            c, s, b = cand[order], score[order], bits[order]
            ends = np.flatnonzero(np.r_[c[1:] != c[:-1], True])
            fld_fis.append(fi)
            fld_cands.append(c[ends])
            fld_scores.append(s[ends])
            fld_bits.append(b[ends])
        if not fld_cands:
            return {"cand": np.empty(0, np.int64),
                    "score": np.empty(0, np.float64)}

        if not ref_multi:
            # weighted SUM across fields: segmented add over the
            # concatenated per-field best arrays
            cand = np.concatenate(fld_cands)
            score = np.concatenate(
                [weights[fi] * s for fi, s in zip(fld_fis, fld_scores)]
            )
            order = np.argsort(cand, kind="stable")
            c = cand[order]
            s = score[order]
            starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
            return {"cand": c[starts], "score": np.add.reduceat(s, starts)}

        # reference cross-field aggregation over the union candidate set
        from typesense_ray.codec import varbyte_decode
        from typesense_ray.functions.dedup import _popcount64

        all_cand = np.unique(np.concatenate(fld_cands))
        agg = np.zeros(all_cand.size, dtype=np.int64)
        tbits = np.full(all_cand.size, 1 << 31, dtype=np.int64)
        matched_mask: dict[int, np.ndarray] = {}
        for fi, fc, fs, fb in zip(fld_fis, fld_cands, fld_scores, fld_bits):
            pos = np.searchsorted(all_cand, fc)
            agg[pos] += weights[fi] * fs.astype(np.int64)
            tbits[pos] |= fb
            m = np.zeros(all_cand.size, dtype=bool)
            m[pos] = True
            matched_mask[fi] = m
        if q_tokens != ["*"]:
            for fi, field in enumerate(fields):
                m = matched_mask.get(fi)
                miss_idx = (
                    np.flatnonzero(~m) if m is not None
                    else np.arange(all_cand.size)
                )
                if miss_idx.size == 0:
                    continue
                missing = all_cand[miss_idx]
                pref = prefs[fi]
                raw = seg.postings([pref(t) for t in q_tokens])
                wp = np.zeros(missing.size, dtype=np.int64)
                pbits = np.zeros(missing.size, dtype=np.int64)
                for i, tok in enumerate(q_tokens):
                    p = raw.get(pref(tok))
                    if p is None:
                        continue
                    ids = decode_posting_ids(p["ids_vb"], p["df"]).astype(
                        np.int64
                    )
                    tfs = varbyte_decode(p["tfs_vb"], p["df"]).astype(np.int64)
                    idx = np.searchsorted(ids, missing)
                    idxc = np.minimum(idx, ids.size - 1)
                    hit = (idx < ids.size) & (ids[idxc] == missing)
                    pbits[hit] |= 1 << i
                    wp[hit] += tfs[idxc[hit]]
                has = wp > 0
                if has.any():
                    ms = (wp[has] << 16) | (255 << 8) | 100
                    agg[miss_idx[has]] += weights[fi] * ms
                tbits[miss_idx] |= pbits
        pc = _popcount64(tbits.astype(np.uint64)).astype(np.int64)
        score = agg | (pc << 48)
        return {"cand": all_cand, "score": score.astype(np.float64)}

    def _rank_segment(self, seg, res, sort_fields, mode, fetch_k, group_fields):
        cand, score = res["cand"], res["score"]
        if cand.size == 0:
            return None
        keys = []
        for sf in sort_fields:
            if sf.name == "_text_match":
                v = score
            else:
                col = seg.docs[sf.name].to_numpy(zero_copy_only=False)[cand]
                # integer sort fields keep int64 keys — float64 has 2^53
                # mantissa precision and collapses adjacent large int64s
                # (the reference sorts int64 exactly,
                # test/collection_sorting_test.cpp:144-199)
                if np.issubdtype(col.dtype, np.integer):
                    v = col.astype(np.int64)
                else:
                    v = col.astype(np.float64)
            keys.append(v if sf.desc else -v)
        gids = seg.doc_ids[cand]
        order = np.lexsort((gids, *reversed(keys)))[::-1]
        if not group_fields:
            order = order[:fetch_k]
        rows = []
        group_vals = (
            {f: seg.docs[f].to_pylist() for f in group_fields} if group_fields else None
        )
        for oi in order:
            row = {
                "doc_id": int(gids[oi]),
                # native item(): int64 keys stay exact ints (float() would
                # reintroduce the 2^53 collapse across segment merges)
                "sort_key": tuple(k[oi].item() for k in keys),
                "score": float(score[oi]) if mode == "bm25" else int(score[oi]),
                "_seg": seg,
                "_local": int(cand[oi]),
            }
            if group_vals is not None:
                # a missing optional field contributes NO component to the
                # compound group key (test/collection_grouping_test.cpp:
                # 161-163: unbranded docs group under key [size] alone)
                row["group_key"] = tuple(
                    _norm_group_val(group_vals[f][cand[oi]])
                    for f in group_fields
                    if group_vals[f][cand[oi]] is not None
                )
            rows.append(row)
        return rows

    def _weave_pinned(self, rows, pinned, fetch_k):
        pinned = sorted(pinned)
        out = [r for r in rows if r["doc_id"] not in {d for _, d in pinned}]
        for pos, did in pinned:
            hit = {"doc_id": did, "sort_key": (), "score": 0.0,
                   "_seg": None, "_local": -1, "_curated": True}
            for seg in self.segments:
                j = np.searchsorted(seg.doc_ids, np.uint64(did))
                if j < seg.n_docs and int(seg.doc_ids[j]) == did:
                    hit["_seg"], hit["_local"] = seg, int(j)
                    break
            out.insert(min(pos - 1, len(out)), hit)
        return out[:fetch_k]

    def _group(self, merged, group_fields, group_limit):
        groups: dict[tuple, list] = {}
        for row in merged:
            groups.setdefault(row["group_key"], []).append(row)
        ranked = []
        for gk, rows in groups.items():
            rows.sort(key=lambda r: (r["sort_key"], r["doc_id"]), reverse=True)
            ranked.append((gk, rows[:group_limit]))
        ranked.sort(
            key=lambda g: (g[1][0]["sort_key"], g[1][0]["doc_id"]), reverse=True
        )
        return ranked

    def _extract_pin_row(self, groups, did, group_fields):
        """Pull the row for ``did`` out of ``groups`` (or synthesize it
        from the doc store when the doc didn't match the query). Returns
        (row_or_None, remaining_groups)."""
        row = None
        pruned = []
        for gk, rows in groups:
            keep = [r for r in rows if r["doc_id"] != did]
            if len(keep) != len(rows):
                row = next(r for r in rows if r["doc_id"] == did)
            if keep:
                pruned.append((gk, keep))
        if row is None:
            for seg in self.segments:
                j = int(np.searchsorted(seg.doc_ids, np.uint64(did)))
                if j < seg.n_docs and int(seg.doc_ids[j]) == did:
                    gk = tuple(
                        _norm_group_val(seg.docs[f][j].as_py())
                        for f in group_fields
                        if seg.docs[f][j].as_py() is not None
                    )
                    row = {"doc_id": did, "sort_key": (), "score": 0.0,
                           "_seg": seg, "_local": j, "group_key": gk}
                    break
        return row, pruned

    def _group_with_pins(self, merged, group_fields, group_limit, pinned):
        """Grouped curation (test/collection_override_test.cpp:489-523 +
        test/collection_grouping_test.cpp:346-425): docs pinned at the
        SAME position gather into one group (keyed by the first pin's
        group key, rule order preserved), pinned groups lead in position
        order, and each absorbs the remainder of the first pin's natural
        group; a pinned doc outside the result set is fetched and its
        group synthesized."""
        groups = self._group(merged, group_fields, group_limit)
        if not pinned:
            return groups
        by_pos: dict[int, list[int]] = {}
        for pos, did in pinned:  # rule order preserved within a position
            by_pos.setdefault(pos, []).append(did)
        out = []
        for pos in sorted(by_pos):
            prows = []
            gk0 = None
            for did in by_pos[pos]:
                row, groups = self._extract_pin_row(
                    groups, did, group_fields
                )
                if row is None:
                    continue
                row["_curated"] = True
                if gk0 is None:
                    gk0 = row["group_key"]
                prows.append(row)
            if not prows:
                continue
            rest = []
            remaining = []
            for g_k, rows in groups:
                if g_k == gk0:
                    rest = rows
                else:
                    remaining.append((g_k, rows))
            groups = remaining
            out.append((gk0, (prows + rest)[:group_limit]))
        return out + groups

    def _facets(self, seg_results, facet_fields, max_facet_values, group_fields,
                facet_query="", hidden=None, pin_locals=None):
        hid = (
            np.fromiter(hidden, dtype=np.uint64, count=len(hidden))
            if hidden else None
        )
        fq_field, fq_tokens = None, []
        if facet_query and ":" in facet_query:
            fq_field, fq_raw = facet_query.split(":", 1)
            fq_field = fq_field.strip()
            fq_tokens = list(norm_tokens(fq_raw))
        out = []
        for ffield in facet_fields:
            kind = self.field_types.get(ffield)
            counts: dict = {}
            repr_raw: dict = {}
            stats = {"min": None, "max": None, "sum": 0.0, "count": 0}
            group_sets: dict = {}
            for si, (seg, res) in enumerate(zip(self.segments, seg_results)):
                cand = res["cand"]
                if pin_locals is not None and pin_locals[si]:
                    cand = np.union1d(
                        cand, np.asarray(pin_locals[si], dtype=cand.dtype)
                    )
                if cand.size and hid is not None:
                    # excluded (hidden/override) docs leave the facet
                    # counts too (test/collection_override_test.cpp:
                    # 224-238: count drops after exclusion)
                    cand = cand[~np.isin(seg.doc_ids[cand], hid)]
                if cand.size == 0:
                    continue
                col = seg.docs[ffield]
                is_arr = pa.types.is_list(col.type) or pa.types.is_large_list(col.type)
                if not is_arr and not group_fields:
                    # vectorized fast path (the common scalar-field case):
                    # one Arrow take + value_counts per segment; string
                    # normalization runs over DISTINCT values only (in
                    # first-appearance order, so the representative raw
                    # value matches the per-doc loop's choice)
                    import pandas as pd
                    import pyarrow.compute as _pc

                    sel = col.combine_chunks().take(pa.array(cand))
                    nn = sel.drop_null()
                    if len(nn) == 0:
                        continue
                    if kind == "str":
                        s = pd.Series(nn.to_pylist(), dtype=object)
                        vc = s.value_counts()
                        for raw in pd.unique(s):
                            vtoks = norm_tokens(str(raw))
                            key = " ".join(vtoks)
                            repr_raw.setdefault(key, str(raw))
                            counts[key] = counts.get(key, 0) + int(vc[raw])
                    else:
                        if kind in ("int", "float"):
                            arr = nn.to_numpy(zero_copy_only=False).astype(
                                np.float64
                            )
                            mn, mx = float(arr.min()), float(arr.max())
                            stats["min"] = mn if stats["min"] is None else min(stats["min"], mn)
                            stats["max"] = mx if stats["max"] is None else max(stats["max"], mx)
                            stats["sum"] += float(arr.sum())
                            stats["count"] += int(arr.size)
                        for row in _pc.value_counts(nn).to_pylist():
                            k = row["values"]
                            counts[k] = counts.get(k, 0) + int(row["counts"])
                    continue
                vals = col.to_pylist()
                if group_fields:
                    gcols = {f: seg.docs[f].to_pylist() for f in group_fields}
                    gvals = [
                        tuple(
                            _norm_group_val(gcols[f][c])
                            for f in group_fields
                            if gcols[f][c] is not None
                        )
                        for c in cand.tolist()
                    ]
                else:
                    gvals = None
                for ci, c in enumerate(cand.tolist()):
                    v = vals[c]
                    elems = v if is_arr and v is not None else [v]
                    for e in elems:
                        if e is None:
                            continue
                        if kind == "str":
                            vtoks = norm_tokens(str(e))
                            key = " ".join(vtoks)
                            repr_raw.setdefault(key, str(e))
                        else:
                            key = e
                            if kind in ("int", "float"):
                                x = float(e)
                                stats["min"] = x if stats["min"] is None else min(stats["min"], x)
                                stats["max"] = x if stats["max"] is None else max(stats["max"], x)
                                stats["sum"] += x
                                stats["count"] += 1
                        if group_fields:
                            group_sets.setdefault(key, set()).add(gvals[ci])
                        else:
                            counts[key] = counts.get(key, 0) + 1
            if group_fields:
                counts = {k: len(s) for k, s in group_sets.items()}
            # facet_query filters the value list (typo/prefix tolerant on
            # EVERY kind — the reference runs the facet query through the
            # same ART fuzzy-prefix search for numeric/bool renderings,
            # test/collection_faceting_test.cpp:360-420) AFTER stats are
            # accumulated and BEFORE the max_facet_values cap
            fq_here = ffield == fq_field and fq_tokens
            cnt_rows = []
            for k, c in sorted(
                counts.items(), key=lambda kv: (-kv[1], str(kv[0]))
            ):
                rendered = _render_facet_val(k, kind)
                if fq_here:
                    vtoks = (
                        k.split(" ") if kind == "str" else [rendered]
                    )
                    if not _facet_value_matches(vtoks, fq_tokens):
                        continue
                row = {
                    "value": (
                        repr_raw.get(k, k) if kind == "str"
                        else rendered if kind == "bool"
                        else k
                    ),
                    "count": c,
                }
                if fq_here:
                    row["highlighted"] = _facet_query_highlight(
                        str(row["value"]) if kind == "str" else rendered,
                        fq_tokens,
                    )
                cnt_rows.append(row)
                if len(cnt_rows) >= max_facet_values:
                    break
            entry = {"field_name": ffield, "counts": cnt_rows}
            if kind in ("int", "float") and stats["count"]:
                entry["stats"] = {
                    "min": stats["min"],
                    "max": stats["max"],
                    "sum": stats["sum"],
                    "avg": stats["sum"] / stats["count"],
                    "count": stats["count"],
                }
            out.append(entry)
        return out

    def _hits(self, rows, include_tokens, mode, include_fields, exclude_fields,
              highlight, text_field, hl_opts=None, query_fields=None,
              full_fields=None):
        hits = []
        tf = text_field or self.stats["config"]["text_field"]
        hl_fields = query_fields or [tf]
        full_fields = full_fields or set()
        for row in rows:
            seg, local = row["_seg"], row["_local"]
            if seg is None:
                continue
            doc = {
                name: seg.docs[name][local].as_py() for name in seg.docs.column_names
            }
            raw_vals = {f: doc.get(f) for f in hl_fields}
            if include_fields:
                doc = {k: v for k, v in doc.items() if k in include_fields}
            if exclude_fields:
                doc = {k: v for k, v in doc.items() if k not in exclude_fields}
            hit = {"document": doc}
            hit["text_match" if mode != "bm25" else "score"] = row["score"]
            if row.get("_curated"):
                # pinned/included results are marked (the reference sets
                # "curated": true only on them,
                # test/collection_override_test.cpp:125-128)
                hit["curated"] = True
            if highlight and include_tokens:
                hit["highlights"] = self._field_highlights(
                    raw_vals, hl_fields, include_tokens, exclude_fields,
                    full_fields, hl_opts or {},
                )
            hits.append(hit)
        return hits

    def _field_highlights(self, raw_vals, hl_fields, include_tokens,
                          exclude_fields, full_fields, hl_opts):
        """One highlight entry per queried field that matched, ordered by
        distinct matched tokens desc then query_by order (the reference
        orders highlight fields by match score,
        ``test/collection_test.cpp:797-818``). Scalar fields carry
        ``snippet`` (+``value`` when listed in highlight_full_fields);
        string[] fields carry per-element ``snippets`` sorted by matched
        count with ties to lower ``indices``, per-element
        ``matched_tokens`` lists, and ``values`` when full
        (``test/collection_test.cpp:647-745, 2359-2433``)."""
        full_opts = dict(hl_opts)
        full_opts["snippet_threshold"] = 1 << 30  # whole field, marked
        entries = []
        for fi, f in enumerate(hl_fields):
            if exclude_fields and f in exclude_fields:
                continue
            val = raw_vals.get(f)
            if val is None:
                continue
            if isinstance(val, list):
                per_el = []
                for ei, el in enumerate(val):
                    if el is None:
                        continue
                    hl = highlight_text(str(el), include_tokens, **hl_opts)
                    if hl:
                        per_el.append((ei, hl, str(el)))
                if not per_el:
                    continue
                per_el.sort(
                    key=lambda t: (-len(t[1]["matched_tokens"]), t[0])
                )
                entry = {
                    "field": f,
                    "snippets": [h["snippet"] for _, h, _ in per_el],
                    "indices": [ei for ei, _, _ in per_el],
                    "matched_tokens": [
                        h["matched_tokens"] for _, h, _ in per_el
                    ],
                }
                if f in full_fields:
                    entry["values"] = [
                        highlight_text(el, include_tokens, **full_opts)[
                            "snippet"
                        ]
                        for _, _, el in per_el
                    ]
                n_matched = max(
                    len(h["matched_tokens"]) for _, h, _ in per_el
                )
            else:
                hl = highlight_text(str(val), include_tokens, **hl_opts)
                if not hl:
                    continue
                entry = {"field": f, **hl}
                if f in full_fields:
                    entry["value"] = highlight_text(
                        str(val), include_tokens, **full_opts
                    )["snippet"]
                n_matched = len(hl["matched_tokens"])
            entries.append((-n_matched, fi, entry))
        entries.sort(key=lambda t: (t[0], t[1]))
        return [e for _, _, e in entries]


def _norm_group_val(v):
    if isinstance(v, list):
        return tuple(v)
    return v


def _dedup_best(cand: np.ndarray, score: np.ndarray) -> dict:
    """Keep the best score per candidate (vectorized Topster kv_map role):
    one stable argsort + segmented maximum."""
    if cand.size == 0:
        return {"cand": np.empty(0, np.int64),
                "score": np.empty(0, np.float64)}
    order = np.argsort(cand, kind="stable")
    c = cand[order]
    s = score[order]
    starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
    return {"cand": c[starts], "score": np.maximum.reduceat(s, starts)}


def _merge_seg_results(a, b):
    return _dedup_best(
        np.concatenate([a["cand"], b["cand"]]).astype(np.int64),
        np.concatenate([a["score"], b["score"]]).astype(np.float64),
    )


def _merge_ranked(parts, hidden: set[int]):
    rows = [r for part in parts for r in part]
    if hidden:
        rows = [r for r in rows if r["doc_id"] not in hidden]
    rows.sort(key=lambda r: (r["sort_key"], r["doc_id"]), reverse=True)
    return rows


def highlight_text(
    text: str,
    query_tokens: list[str],
    *,
    snippet_threshold: int = SNIPPET_THRESHOLD,
    affix_tokens: int = HIGHLIGHT_AFFIX,
    start_tag: str = "<mark>",
    end_tag: str = "</mark>",
) -> dict | None:
    """Snippet highlighting (``src/collection.cpp:1309-1473``): locate
    query tokens, wrap matches in ``start_tag``/``end_tag``, and when
    the field is longer than ``snippet_threshold`` tokens emit a window
    padded by ``affix_tokens`` tokens around the matched span. (The
    reference windows around the best proximity match; this highlights
    around the first..last matched slots — observable output matches
    for the common single-span case.) ``matched_tokens`` carry the
    ORIGINAL casing (the reference reports "Stark" for query "stark",
    test/collection_test.cpp:2103-2135)."""
    import re

    slots_raw = text.replace("\n", " ").split(" ")
    qset = set(query_tokens)
    matched_idx = []
    matched_tokens = []
    normed = [None] * len(slots_raw)
    for i, raw in enumerate(slots_raw):
        t = norm_tokens(raw)
        nt = t[0] if t else ""
        normed[i] = nt
        if nt and nt in qset:
            matched_idx.append(i)
            # keep unicode letters — accented originals are reported
            # verbatim ("à", CollectionTest.HighlightWithAccentedCharacters)
            raw_tok = re.sub(r"[\W_]", "", raw)
            if raw_tok and raw_tok not in matched_tokens:
                matched_tokens.append(raw_tok)
    if not matched_idx:
        return None
    if len(slots_raw) <= snippet_threshold:
        lo, hi = 0, len(slots_raw) - 1
    else:
        # window around the BEST match span: the 10-slot window holding the
        # most distinct query tokens (earliest on ties), like the reference's
        # proximity Match window (include/match_score.h:106-120)
        best_start, best_end, best_n = matched_idx[0], matched_idx[0], 1
        marr = np.asarray(matched_idx)
        for s in matched_idx:
            in_win = marr[(marr >= s) & (marr <= s + 10)]
            n_distinct = len({normed[i] for i in in_win})
            if n_distinct > best_n:
                best_n, best_start, best_end = n_distinct, s, int(in_win[-1])
        lo = max(0, best_start - affix_tokens)
        hi = min(len(slots_raw) - 1, best_end + affix_tokens)
    pieces = []
    for i in range(lo, hi + 1):
        if normed[i] and normed[i] in qset:
            pieces.append(f"{start_tag}{slots_raw[i]}{end_tag}")
        else:
            pieces.append(slots_raw[i])
    return {"snippet": " ".join(pieces), "matched_tokens": matched_tokens}


def _facet_query_highlight(raw: str, query_tokens) -> str:
    """``<mark>``-wrap the matched portion of a facet value under
    facet_query (the reference returns ``highlighted`` per facet count,
    e.g. "brand: omeg" → "<mark>Omeg</mark>a";
    ``src/collection.cpp`` facet highlight in ``search``): the first
    original-text word whose normalized form prefix-matches the LAST
    query token gets its matched prefix wrapped (case preserved); words
    matching earlier query tokens wrap whole."""
    import re

    from typesense_ray.tokenizer import normalize_token

    qlast = query_tokens[-1]
    last_cost = 0 if len(qlast) < 3 else 1
    earlier = set(query_tokens[:-1])
    out = []
    marked_prefix = False
    for part in re.split(r"(\s+)", raw):
        if not part or part.isspace():
            out.append(part)
            continue
        norm = " ".join(norm_tokens(part))
        k_star = (
            None if marked_prefix
            else _prefix_match_len(qlast, norm, last_cost)
        )
        if k_star is not None:
            # map the normalized matched-prefix length back to RAW
            # offsets: chars stripped/expanded by normalization (leading
            # punctuation, transliteration) shift the span — '.Omega' +
            # 'omeg' must mark '.<mark>Omeg</mark>a', not
            # '<mark>.Ome</mark>ga'
            start = end = None
            consumed = 0
            for i, ch in enumerate(part):
                piece = normalize_token(ch)
                if piece and start is None:
                    start = i
                consumed += len(piece)
                if consumed >= k_star:
                    end = i + 1
                    break
            if start is None or end is None:
                start, end = 0, min(k_star, len(part))
            out.append(
                f"{part[:start]}<mark>{part[start:end]}</mark>{part[end:]}"
            )
            marked_prefix = True
        elif norm in earlier:
            out.append(f"<mark>{part}</mark>")
        else:
            out.append(part)
    return "".join(out)


def _render_facet_val(v, kind: str) -> str:
    """Reference-style string rendering of a facet value for facet_query
    matching / highlighting: bools as ``true``/``false``
    (test/collection_faceting_test.cpp:522), numerics via str()."""
    if kind == "bool":
        return "true" if v else "false"
    return str(v)


def _prefix_match_len(q: str, t: str, cost: int) -> int | None:
    """Matched-prefix length of value token ``t`` under facet-query last
    token ``q`` — the reference's ART fuzzy-PREFIX search semantics
    (``art_fuzzy_search(..., prefix=true)`` in ``Index::do_facets``):
    ``t`` matches when SOME prefix of it is within OSA distance ``cost``
    of ``q`` (so 'cellx' matches both 'cell' and 'cellophanes',
    test/collection_faceting_test.cpp:645-658). Returns the longest such
    prefix length (the highlight span), or None."""
    from typesense_ray.typo import osa_distance

    if t.startswith(q):
        return len(q)
    if cost == 0:
        return None
    best = None
    for k in range(max(1, len(q) - cost), min(len(t), len(q) + cost) + 1):
        if osa_distance(q, t[:k], cost) <= cost:
            best = k
    return best


def _facet_value_matches(value_tokens, query_tokens) -> bool:
    """Facet-query filtering (``Index::do_facets`` facet_query path,
    ``src/index.cpp:679-707``): every facet-query token must match some
    value token — the last query token by fuzzy PREFIX (cost 0 when
    len<3 else 1), earlier ones by whole-token fuzzy at the same cost."""
    from typesense_ray.typo import osa_distance

    for qi, qt in enumerate(query_tokens):
        is_last = qi == len(query_tokens) - 1
        cost = 0 if len(qt) < 3 else 1
        ok = False
        for vt in value_tokens:
            if is_last:
                if _prefix_match_len(qt, vt, cost) is not None:
                    ok = True
                    break
            elif osa_distance(qt, vt, cost) <= cost:
                ok = True
                break
        if not ok:
            return False
    return True


class CollectionRegistry:
    """Named collections + aliases/symlinks (``src/collection_manager.cpp``):
    an alias resolves to a collection name at lookup time, so swapping the
    target re-points readers atomically. Manager parity
    (test/collection_manager_test.cpp): collections get monotonically
    increasing ids (never reused after a drop), ``get_collections`` lists
    most-recently-created first, a symlink may point at a not-yet-existing
    collection but its NAME must not shadow an existing collection."""

    def __init__(self, root: str | None = None):
        self._collections: dict[str, RayCollection] = {}
        self._aliases: dict[str, str] = {}
        self._meta: dict[str, dict] = {}  # name -> {"id", "created_at"}
        self._next_collection_id = 0
        self.root = root

    def register(self, name: str, coll, created_at: int = 0):
        if name not in self._meta:
            self._meta[name] = {
                "id": self._next_collection_id,
                "created_at": int(created_at),
            }
            self._next_collection_id += 1
        if hasattr(coll, "collection_id"):
            coll.collection_id = self._meta[name]["id"]
        self._collections[name] = coll
        return coll

    def create_collection(self, name: str, fields,
                          default_sorting_field: str | None = None, *,
                          created_at: int = 0, index_dir: str | None = None):
        """``CollectionManager::create_collection``
        (src/collection_manager.cpp:270-330): schema validation + id
        assignment. ``fields`` is a list of
        :class:`~typesense_ray.validate.FieldSpec`."""
        from typesense_ray.manager import DocumentError, ManagedCollection

        if name in self._collections:
            raise DocumentError(
                409, f"A collection with name `{name}` already exists."
            )
        if index_dir is None:
            if self.root is None:
                raise ValueError(
                    "pass index_dir or construct the registry with root="
                )
            index_dir = f"{self.root}/{name}"
        coll = ManagedCollection(
            name, index_dir, fields, default_sorting_field,
            created_at=created_at,
        )
        return self.register(name, coll, created_at=created_at)

    def init_collection(self, meta: dict):
        """Rebuild an (unregistered) collection object from its persisted
        meta JSON (``CollectionManager::init_collection``) — ``created_at``
        defaults to 0 when absent."""
        from typesense_ray.manager import ManagedCollection
        from typesense_ray.validate import FieldSpec

        fields = [
            FieldSpec(f["name"], f["type"], facet=bool(f.get("facet")),
                      optional=bool(f.get("optional")))
            for f in meta["fields"]
        ]
        coll = ManagedCollection(
            meta["name"],
            f"{self.root or '.'}/{meta['name']}",
            fields,
            meta.get("default_sorting_field") or None,
            created_at=meta.get("created_at", 0),
        )
        coll.collection_id = meta.get("id")
        return coll

    # -- lookups ---------------------------------------------------------

    def get_collection(self, name: str):
        """Manager-style lookup: resolves aliases, returns None when
        missing (``CollectionManager::get_collection``)."""
        name = self._aliases.get(name, name)
        return self._collections.get(name)

    def get_collection_with_id(self, cid: int):
        for name, m in self._meta.items():
            if m["id"] == cid and name in self._collections:
                return self._collections[name]
        return None

    def get_collections(self) -> list:
        """Most recently created first
        (CollectionManagerTest.GetAllCollections)."""
        names = sorted(
            (n for n in self._collections),
            key=lambda n: -self._meta[n]["id"],
        )
        return [self._collections[n] for n in names]

    def get_next_collection_id(self) -> int:
        return self._next_collection_id

    def collection_meta(self, name: str) -> dict | None:
        return self._meta.get(name)

    # -- symlinks / aliases ------------------------------------------------

    def upsert_symlink(self, alias: str, target: str):
        """Dangling targets are allowed; the alias NAME must not shadow a
        collection (CollectionManagerTest.Symlinking)."""
        if alias in self._collections:
            raise ValueError(
                f"Name `{alias}` conflicts with an existing collection "
                f"name."
            )
        self._aliases[alias] = target

    upsert_alias = upsert_symlink

    def resolve_symlink(self, alias: str) -> str:
        if alias not in self._aliases:
            raise KeyError(f"Not found: {alias}")
        return self._aliases[alias]

    def get_symlinks(self) -> dict[str, str]:
        return dict(self._aliases)

    def drop_alias(self, alias: str):
        self._aliases.pop(alias, None)

    delete_symlink = drop_alias

    def get(self, name: str) -> RayCollection:
        name = self._aliases.get(name, name)
        try:
            return self._collections[name]
        except KeyError:
            raise KeyError(f"no collection or alias named {name!r}") from None

    def drop(self, name: str):
        """Drop a collection from the registry (the index dirs stay on
        disk; ``CollectionManager::drop_collection`` also deletes rows,
        which here is the owner's rm -rf of the index_dir). Resolves
        aliases like ``get_collection`` does — the reference drops the
        RESOLVED collection (core_api del_drop_collection fetches by
        alias then drops ``collection->get_name()``), so dropping via an
        alias must not be a silent no-op. The next collection id is NOT
        reused, and symlinks survive — they may dangle until the name is
        recreated (CollectionManagerTest.DropCollectionCleanly)."""
        name = self._aliases.get(name, name)
        self._collections.pop(name, None)
        self._meta.pop(name, None)

    drop_collection = drop

    # -- persistence (CollectionManager::load role,
    # test/collection_manager_test.cpp:138-271: a fresh manager restores
    # collections, overrides, synonyms and serves identical results) ----

    def _manifest_path(self, path: str | None) -> str:
        if path is None:
            if self.root is None:
                raise ValueError(
                    "pass path= or construct the registry with root="
                )
            path = f"{self.root}/registry.json"
        import os as _os

        if _os.path.isdir(path):
            path = _os.path.join(path, "registry.json")
        return path

    def save(self, path: str | None = None):
        """One JSON manifest: per collection its index_dir + config +
        curation state (+ the declared FieldSpec schema for typed
        collections, so a reload restores a mutable
        :class:`~typesense_ray.manager.ManagedCollection`, not just a
        read view). Index data itself is already durable parquet.
        Defaults to ``{root}/registry.json``."""
        import json as _json

        state = {
            "collections": {},
            "aliases": dict(self._aliases),
            "meta": self._meta,
            "next_collection_id": self._next_collection_id,
        }
        for name, coll in self._collections.items():
            entry = {
                "index_dir": getattr(coll, "index_dir", None)
                or coll._local.index_dir,
                "default_sorting_field": coll.default_sorting_field,
                "synonyms": coll.synonyms.get_synonyms(),
                "overrides": [
                    {
                        "id": o.rule_id,
                        "rule_query": o.rule_query,
                        "match": o.match,
                        "includes": list(map(list, o.includes)),
                        "excludes": list(o.excludes),
                        **({"raw": o.raw} if o.raw is not None else {}),
                    }
                    for o in coll.overrides
                ],
            }
            if hasattr(coll, "fields"):  # typed ManagedCollection
                entry["fields"] = [
                    {"name": f.name, "type": f.type, "facet": f.facet,
                     "optional": f.optional}
                    for f in coll.fields
                ]
                entry["created_at"] = coll.created_at
                entry["next_seq"] = coll._next_seq
            state["collections"][name] = entry
        with open(self._manifest_path(path), "w") as f:
            _json.dump(state, f)

    @classmethod
    def load(cls, path: str) -> "CollectionRegistry":
        """``path`` may be the manifest file or the registry root
        directory written by :meth:`save`. Collections saved with a
        declared schema come back as mutable
        :class:`~typesense_ray.manager.ManagedCollection`s (continuing
        the auto-id sequence); schemaless ones as read-view
        :class:`RayCollection`s."""
        import json as _json
        import os as _os

        root = None
        if _os.path.isdir(path):
            root = path
            path = _os.path.join(path, "registry.json")
        with open(path) as f:
            state = _json.load(f)
        reg = cls(root=root)
        for name, c in state["collections"].items():
            syn = SynonymIndex()
            for sid, d in c["synonyms"].items():
                obj = {"id": sid, "synonyms": d["synonyms"]}
                if d.get("root"):
                    obj["root"] = d["root"]
                syn.add_json(obj)
            ovs = [
                Override(
                    rule_id=o["id"], rule_query=o["rule_query"],
                    match=o["match"],
                    includes=[tuple(x) for x in o["includes"]],
                    excludes=list(o["excludes"]),
                    raw=o.get("raw"),
                )
                for o in c["overrides"]
            ]
            if c.get("fields"):
                from typesense_ray.manager import ManagedCollection
                from typesense_ray.validate import FieldSpec

                coll = ManagedCollection(
                    name,
                    c["index_dir"],
                    [FieldSpec(f["name"], f["type"],
                               facet=bool(f.get("facet")),
                               optional=bool(f.get("optional")))
                     for f in c["fields"]],
                    c["default_sorting_field"] or None,
                    created_at=c.get("created_at", 0),
                )
                # never rewind past the per-commit sidecar the
                # constructor restored — a stale registry snapshot must
                # not recycle auto ids consumed after it was written
                coll._next_seq = max(int(c.get("next_seq", 0)),
                                     coll._next_seq)
                coll.synonyms = syn
                coll.overrides = ovs
                reg.register(name, coll)
                continue
            reg.register(
                name,
                RayCollection(
                    c["index_dir"],
                    default_sorting_field=c["default_sorting_field"],
                    synonyms=syn, overrides=ovs,
                ),
            )
        reg._aliases = dict(state.get("aliases", {}))
        if "meta" in state:
            reg._meta = dict(state["meta"])
            # register() handed out fresh sequential ids; re-sync each
            # collection's id to the persisted meta
            for name, m in reg._meta.items():
                c = reg._collections.get(name)
                if c is not None and hasattr(c, "collection_id"):
                    c.collection_id = m["id"]
        reg._next_collection_id = int(
            state.get("next_collection_id", len(reg._collections))
        )
        return reg

"""IndexShard — the stateful query-serving unit (one per term-shard).

The Ray analog of a SolrCloud shard replica + Lucene IndexSearcher leaf
(SURVEY.md §2.4 "Query-serving searcher"): a plain class (wrapped with
`ray.remote` by the Searcher) that loads its shard's encoded postings into
memory ONCE in `__init__` and answers `top_k(query_node, k, idfs, ...)`
calls.  All per-query work is vectorized numpy over decoded posting arrays:

- TermQuery    → decode (docs, freqs, norms), score via bm25.score_postings
  (lucene/core/.../search/TermQuery.java + TermScorer.java)
- BooleanQuery → sorted-array intersect/union/difference with score
  accumulation (BooleanWeight / ConjunctionDISI / DisjunctionSumScorer)
- PhraseQuery  → composite-key (doc, pos−offset) intersection over decoded
  position lists (ExactPhraseMatcher)
- top-k        → argpartition + (score desc, docID asc) tie-break
  (TopScoreDocCollector / HitQueue)
- block-max pruning for scored disjunctions via per-block upper bounds
  (WANDScorer / MaxScoreCache; Ding & Suel 2011) — vectorized variant:
  exact-score the top candidate blocks to get a floor θ, then drop all docs
  whose summed block upper bound < θ before exact scoring.

Salted posting runs (skew handling) are concatenated in salt order at first
touch — runs cover disjoint, increasing docID ranges by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from ..index import codec
from .bm25 import (
    block_upper_bound,
    score_postings,
    score_postings_classic,
    score_postings_dfr,
    score_postings_lm,
)
from .query import QueryNode

_POS_LIMIT = 1 << 22  # composite phrase key = doc * _POS_LIMIT + pos

_EMPTY_I64 = np.empty(0, dtype=np.int64)
_EMPTY_F64 = np.empty(0, dtype=np.float64)


class IndexShard:
    def __init__(
        self,
        shard_dirs: str | list[str],
        norm_cache=None,
        codec_name: str = "varbyte",
        avgdls: dict[str, float] | None = None,
    ):
        """`shard_dirs` may be one dir or several — an actor owns one or
        more term-shards (the pool is sized to the cluster, so on small
        clusters each actor serves multiple shards).

        `norm_cache` is the text-field 256-entry BM25 cache, or a dict
        {"": text_cache, field: field_cache} when extra analyzed fields
        exist (per-field norms — `field:token` terms score with their
        field's cache)."""
        if isinstance(norm_cache, dict):
            self.norm_caches = norm_cache
            norm_cache = norm_cache.get("")
        else:
            self.norm_caches = {"": norm_cache}
        if isinstance(shard_dirs, str):
            shard_dirs = [shard_dirs]
        import glob

        import pyarrow as pa

        tables = []
        row_shard: list[int] = []  # shard ordinal per row, for run ordering
        for si, d in enumerate(sorted(shard_dirs)):
            for f in sorted(glob.glob(f"{d}/*.parquet")):
                t = pq.read_table(f)
                tables.append(t)
                row_shard.extend([si] * t.num_rows)
        self.table = pa.concat_tables(tables) if tables else None
        self.norm_cache = norm_cache
        self._codec = codec_name
        self._avgdls = avgdls or {}
        self._dfr_tables: dict[str, np.ndarray] = {}
        self._axio_tables: dict[str, np.ndarray] = {}
        self._rows: dict[str, list[int]] = {}
        if self.table is not None:
            terms = self.table.column("term").to_pylist()
            salts = self.table.column("salt").to_pylist()
            order: dict[str, list[tuple[int, int, int]]] = {}
            # salted runs concatenate in (shard, salt) order → global docID
            # order (shards are contiguous doc ranges; salts are contiguous
            # pid runs within a shard)
            for i, (t, s) in enumerate(zip(terms, salts)):
                order.setdefault(t, []).append((row_shard[i], s, i))
            self._rows = {t: [i for _, _, i in sorted(v)] for t, v in order.items()}
            self._col = {name: self.table.column(name) for name in self.table.schema.names}
        # bounded decoded-postings cache (the filter/documentCache analog,
        # solr FastLRUCache): unbounded decode caches leak in a long-lived
        # serving actor
        from ..state import LRUCache

        self._cache = LRUCache(max_items=50_000)
        # queryResultCache (solr/core/.../search/SolrIndexSearcher.java ::
        # getDocListC): repeated (query, k, sim) calls short-circuit
        self._result_cache = LRUCache(max_items=1024)
        self._prune_candidates = 0
        self._prune_survivors = 0
        # per-shard tombstones (live-docs bitset analog): masked ONCE at
        # posting decode, so every read path sees only live docs and the
        # driver never over-fetches k + |deletes|
        self._dead = np.empty(0, dtype=np.int64)

    def ping(self) -> bool:
        return True

    # -- tombstones (per-shard live docs) ---------------------------------
    def set_tombstones(self, dead: np.ndarray) -> None:
        """Install the deleted-doc set (sorted at install).  Decoded-posting
        and result caches are invalidated: postings are masked at decode, so
        the per-query cost of deletes is ZERO regardless of tombstone count
        (the Lucene live-docs-bitset shape, lucene/core/.../codecs/lucene50/
        Lucene50LiveDocsFormat.java)."""
        self._dead = np.sort(np.asarray(dead, dtype=np.int64))
        self._cache.clear()
        self._result_cache.clear()

    def _live_mask(self, docs: np.ndarray) -> np.ndarray | None:
        """Boolean live mask via binary search on the sorted dead set, or
        None when nothing is masked."""
        if not self._dead.size or not docs.size:
            return None
        i = np.minimum(np.searchsorted(self._dead, docs), self._dead.size - 1)
        live = self._dead[i] != docs
        return None if live.all() else live

    # -- shard-local term dictionary (the per-shard term dict of the
    # reference: prefix/fuzzy expansion, /terms and spellcheck run HERE and
    # the driver merges partials — the vocabulary never lands on one node)
    def _term_dict(self):
        """Sorted local term array + summed local dfs (built lazily once;
        a term's global df = Σ its per-shard dfs, since salted runs
        partition the doc space)."""
        if getattr(self, "_local_terms", None) is None:
            if self.table is None:
                self._local_terms = np.empty(0, dtype=object)
                self._local_dfs = np.empty(0, dtype=np.int64)
            else:
                df_col = self.table.column("df").to_numpy()
                terms = sorted(self._rows)
                dfs = np.empty(len(terms), dtype=np.int64)
                for i, t in enumerate(terms):
                    dfs[i] = int(df_col[self._rows[t]].sum())
                self._local_terms = np.array(terms, dtype=object)
                self._local_dfs = dfs
        return self._local_terms, self._local_dfs

    def _rev_dict(self):
        """Reverse-sorted companion dictionary (ReversedWildcardFilter-
        Factory's leading-wildcard trick, solr/core/.../analysis/
        ReversedWildcardFilterFactory.java — built lazily as a LOCAL
        sorted array instead of doubling the postings: the reversed terms
        only serve dictionary lookup, scoring uses the original terms)."""
        if getattr(self, "_rev_terms", None) is None:
            terms, _ = self._term_dict()
            rev = np.array([str(t)[::-1] for t in terms], dtype=object)
            order = np.argsort(rev)
            self._rev_terms = rev[order]
            self._rev_orig = terms[order]
        return self._rev_terms, self._rev_orig

    def expand_nodes(self, specs: list[tuple[str, str, int]]) -> dict:
        """Expand multi-term leaves against the LOCAL vocabulary.
        `specs`: [(kind, pattern, max_edits)] → {spec: [matching terms]}.
        The driver unions per-shard matches (sorted, capped) — the
        distributed Query.rewrite step (SURVEY.md §3.2).  Leading-wildcard
        patterns with a literal tail cut the reversed dictionary by prefix
        (binary search) instead of scanning the whole vocabulary."""
        import re as _re

        from .query import MAX_EXPANSIONS, QueryNode, _wildcard_to_re, expand_multi_term

        terms, _ = self._term_dict()
        out = {}
        self.last_wildcard_plan = None
        for kind, pattern, max_edits in specs:
            spec = (kind, pattern, max_edits)
            if kind == "wildcard" and pattern and pattern[0] in "*?":
                m = _re.search(r"[^*?]+$", pattern)
                if m and len(m.group(0)) >= 2:
                    revs, origs = self._rev_dict()
                    pre = m.group(0)[::-1]
                    lo = int(np.searchsorted(revs, pre))
                    hi = int(np.searchsorted(revs, pre + "￿"))
                    rx = _wildcard_to_re(pattern)
                    cand = [str(t) for t in origs[lo:hi] if rx.match(str(t))]
                    out[spec] = sorted(cand)[:MAX_EXPANSIONS]
                    self.last_wildcard_plan = "reversed"
                    continue
                self.last_wildcard_plan = "scan"
            n = QueryNode(kind, pattern=pattern, max_edits=max_edits)
            out[spec] = expand_multi_term(n, terms)
        return out

    def get_last_wildcard_plan(self):
        """Introspection for tests: 'reversed' | 'scan' | None."""
        return getattr(self, "last_wildcard_plan", None)

    def terms_partial(self, prefix: str = "", regex: str | None = None, regex_dialect: str = "java"):
        """(terms, local_dfs) in the prefix range — the per-shard half of
        the TermsComponent merge (solr/core/.../handler/component/
        TermsComponent.java).  `regex` is terms.regex: an anchored match
        applied SHARD-SIDE after the prefix cut, so only matching terms
        travel.  Dialect: Solr's TermsComponent compiles java.util.regex
        (Python `re` is the close analog, the default); pass
        regex_dialect="lucene" for the RegexpQuery automaton syntax
        (search/lucene_regexp.py) when the pattern comes from a /re/
        query."""
        terms, dfs = self._term_dict()
        lo = int(np.searchsorted(terms, prefix))
        hi = int(np.searchsorted(terms, prefix + "￿")) if prefix else terms.size
        terms, dfs = terms[lo:hi], dfs[lo:hi]
        if regex is not None:
            if regex_dialect == "lucene":
                from .lucene_regexp import compile_regexp

                rx = compile_regexp(regex)
            else:
                import re

                rx = re.compile(regex)
            keep = np.array([rx.fullmatch(str(t)) is not None for t in terms], dtype=bool)
            terms, dfs = terms[keep], dfs[keep]
        return terms, dfs

    def spellcheck_partial(self, word: str, max_edits: int = 2):
        """[(term, local_df, dist)] within `max_edits` of `word` — the
        per-shard half of the SpellCheckComponent merge."""
        from .spell import levenshtein_candidates

        terms, dfs = self._term_dict()
        return levenshtein_candidates(terms, dfs, word, max_edits)

    def result_cache_stats(self) -> dict:
        return self._result_cache.stats()

    def prune_stats(self) -> dict:
        """Cumulative block-max pruning effectiveness (Ding & Suel-style
        'fraction of candidates never exactly scored')."""
        c, s = self._prune_candidates, self._prune_survivors
        return {
            "candidates": c,
            "scored": s,
            "pruned_frac": (1.0 - s / c) if c else 0.0,
            "cache": self._cache.stats(),
        }

    # -- postings access ---------------------------------------------------
    def _postings(self, term: str, with_positions: bool = False):
        """→ (docs, freqs, norm_bytes[, positions, pos_starts]) or None."""
        cached = self._cache.get(term)
        if cached is not None and (not with_positions or len(cached) == 5):
            return cached
        rows = self._rows.get(term)
        if not rows:
            return None
        docs_l, freqs_l, norms_l, pos_l = [], [], [], []
        for r in rows:
            df = self._col["df"][r].as_py()
            docs_l.append(codec.decode_docs(self._col["docs"][r].as_py(), df, self._codec))
            fr = codec.decode_freqs(self._col["freqs"][r].as_py(), df, self._codec)
            freqs_l.append(fr)
            norms_l.append(np.frombuffer(self._col["norms"][r].as_py(), dtype=np.uint8))
            if with_positions:
                flat, _ = codec.decode_positions(self._col["positions"][r].as_py(), fr, self._codec)
                pos_l.append(flat)
        docs = np.concatenate(docs_l)
        freqs = np.concatenate(freqs_l)
        norms = np.concatenate(norms_l)
        positions = (np.concatenate(pos_l) if pos_l else _EMPTY_I64) if with_positions else None
        # tombstone mask applied ONCE at decode — cached postings are
        # already live-only, so deletes cost nothing per query
        live = self._live_mask(docs)
        if live is not None:
            if positions is not None:
                positions = positions[np.repeat(live, freqs)]
            docs, freqs, norms = docs[live], freqs[live], norms[live]
        if with_positions:
            starts = np.zeros(freqs.size, dtype=np.int64)
            np.cumsum(freqs[:-1], out=starts[1:])
            out = (docs, freqs, norms, positions, starts)
        else:
            out = (docs, freqs, norms)
        self._cache.put(term, out)
        return out

    def _block_meta(self, term: str):
        """Concatenated (last_doc, max_freq, min_norm) block arrays."""
        rows = self._rows.get(term)
        if not rows:
            return None
        last = np.concatenate([np.asarray(self._col["blk_last_doc"][r].as_py(), dtype=np.int64) for r in rows])
        maxf = np.concatenate([np.asarray(self._col["blk_max_freq"][r].as_py(), dtype=np.int64) for r in rows])
        minn = np.concatenate([np.asarray(self._col["blk_min_norm"][r].as_py(), dtype=np.int64) for r in rows])
        return last, maxf, minn

    # -- scoring -----------------------------------------------------------
    def _cache_for(self, term: str) -> np.ndarray:
        """Per-field norm cache: `field:token` terms of an analyzed extra
        field score with that field's avgdl; keyword-filter terms and plain
        text terms use the text cache."""
        if ":" in term and len(self.norm_caches) > 1:
            c = self.norm_caches.get(term.split(":", 1)[0])
            if c is not None:
                return c
        return self.norm_cache

    def _dfr_table_for(self, term: str) -> np.ndarray:
        """Per-field DFR tfn factor table, built once per actor per field."""
        field = ""
        if ":" in term:
            f = term.split(":", 1)[0]
            if f in self._avgdls:
                field = f
        if field not in self._dfr_tables:
            from .bm25 import make_dfr_table

            self._dfr_tables[field] = make_dfr_table(self._avgdls.get(field, 0.0))
        return self._dfr_tables[field]

    def _axio_table_for(self, term: str) -> np.ndarray:
        """Per-field Axiomatic F2EXP denominator table (s + s·dl/avgdl)."""
        field = ""
        if ":" in term:
            f = term.split(":", 1)[0]
            if f in self._avgdls:
                field = f
        if field not in self._axio_tables:
            from .bm25 import make_axiomatic_table

            self._axio_tables[field] = make_axiomatic_table(self._avgdls.get(field, 0.0))
        return self._axio_tables[field]

    def _apply_sim(
        self, freqs: np.ndarray, norm_b: np.ndarray, w: float, sim: str, lead: str
    ) -> np.ndarray:
        """One Similarity dispatch for every scoring path (term/synonym/
        phrase/multi-phrase/freq-docs) — the pluggable-Similarity SPI
        (SURVEY §2.11 search/similarities/).  `w` is the driver-computed
        per-term weight (meaning varies per sim); `lead` selects the
        per-field norm/tfn tables."""
        from .bm25 import (
            score_postings_axiomatic,
            score_postings_bool,
            score_postings_ib,
            score_postings_lmjm,
        )

        if sim == "classic":
            return score_postings_classic(freqs, norm_b, w)
        if sim == "lm":
            return score_postings_lm(freqs, norm_b, w)
        if sim == "lmjm":
            return score_postings_lmjm(freqs, norm_b, w)
        if sim.startswith("dfr"):  # dfr / dfr_if / dfr_ine share the L+H2 kernel
            return score_postings_dfr(freqs, norm_b, w, self._dfr_table_for(lead))
        if sim == "ib":
            return score_postings_ib(freqs, norm_b, w, self._dfr_table_for(lead))
        if sim == "axiomatic":
            return score_postings_axiomatic(freqs, norm_b, w, self._axio_table_for(lead))
        if sim == "bool":
            return score_postings_bool(freqs, w)
        if sim.startswith("dfi"):
            from .bm25 import score_postings_dfi

            return score_postings_dfi(freqs, norm_b, w, sim)
        return score_postings(freqs, norm_b, w, self._cache_for(lead))

    def _score_term(self, term: str, idfs: dict[str, float], sim: str = "bm25"):
        p = self._postings(term)
        if p is None:
            return _EMPTY_I64, _EMPTY_F64
        docs, freqs, norms = p[0], p[1], p[2]
        return docs, self._apply_sim(freqs, norms, idfs.get(term, 0.0), sim, term)

    def _score_synonym(self, terms: list[str], idfs: dict[str, float], sim: str = "bm25"):
        """SynonymQuery (lucene/core/.../search/SynonymQuery.java): members
        score as ONE pseudo-term — per-doc freq is the SUM over members,
        and the blended weight (idf of max df, driver-computed from global
        stats under `synonym_weight_key`) scores the union list."""
        from .query import synonym_weight_key

        plists = [p for t in terms if (p := self._postings(t)) is not None]
        if not plists:
            return _EMPTY_I64, _EMPTY_F64
        docs_c = np.concatenate([p[0] for p in plists])
        freqs_c = np.concatenate([p[1] for p in plists])
        norms_c = np.concatenate([p[2] for p in plists])
        order = np.argsort(docs_c, kind="stable")
        docs_c, freqs_c, norms_c = docs_c[order], freqs_c[order], norms_c[order]
        first = np.ones(docs_c.size, bool)
        first[1:] = docs_c[1:] != docs_c[:-1]
        starts = np.flatnonzero(first)
        docs = docs_c[starts]
        freqs = np.add.reduceat(freqs_c, starts)
        norms = norms_c[starts]
        w = idfs.get(synonym_weight_key(terms), 0.0)
        return docs, self._apply_sim(freqs, norms, w, sim, terms[0])

    def _score_phrase(self, terms: list[str], idfs: dict[str, float], slop: int = 0, sim: str = "bm25"):
        """Phrase matching: (docs, scores) for docs with phrase_freq > 0.
        slop=0 uses the vectorized composite-key exact matcher; slop>0
        walks candidate docs with the shared sloppy matcher."""
        plists = []
        for t in terms:
            p = self._postings(t, with_positions=True)
            if p is None:
                return _EMPTY_I64, _EMPTY_F64
            plists.append(p)
        if slop > 0:
            return self._score_sloppy(terms, plists, idfs, slop, sim)
        # composite keys (doc * POS_LIMIT + pos - offset), intersected
        keys = None
        for off, (docs, freqs, norms, positions, starts) in enumerate(plists):
            doc_of_pos = np.repeat(docs, freqs)
            pos_adj = positions - off
            valid = pos_adj >= 0
            k = doc_of_pos[valid] * _POS_LIMIT + pos_adj[valid]
            keys = k if keys is None else np.intersect1d(keys, k, assume_unique=True)
            if keys.size == 0:
                return _EMPTY_I64, _EMPTY_F64
        match_docs, pf = np.unique(keys // _POS_LIMIT, return_counts=True)
        # norms of matching docs from the first term's posting list
        docs0, _, norms0 = plists[0][0], plists[0][1], plists[0][2]
        idx = np.searchsorted(docs0, match_docs)
        norm_b = norms0[idx]
        idf_sum = sum(idfs.get(t, 0.0) for t in terms)
        return match_docs, self._apply_sim(pf, norm_b, idf_sum, sim, terms[0])

    def _score_multi_phrase(
        self, slots: list[list[str]], idfs: dict[str, float], slop: int = 0, sim: str = "bm25"
    ):
        """MultiPhraseQuery (lucene/core/.../search/MultiPhraseQuery.java):
        each slot's alternative postings UNION before the phrase chain —
        slop=0 reuses the composite-key intersect on per-slot unioned
        keys; slop>0 chains per-slot unioned intervals.  idf sums over
        every alternative (BM25Similarity over combined TermStatistics);
        a slot with no indexed alternative matches nothing."""
        slot_plists: list[list[tuple]] = []
        for alts in slots:
            pl = [p for t in alts if (p := self._postings(t, with_positions=True)) is not None]
            if not pl:
                return _EMPTY_I64, _EMPTY_F64
            slot_plists.append(pl)
        # norms map: union of slot-0 alternatives (any match contains one)
        d0 = np.concatenate([p[0] for p in slot_plists[0]])
        n0 = np.concatenate([p[2] for p in slot_plists[0]])
        order = np.argsort(d0, kind="stable")
        d0, n0 = d0[order], n0[order]
        keep = np.ones(d0.size, bool)
        keep[1:] = d0[1:] != d0[:-1]
        d0, n0 = d0[keep], n0[keep]
        # absent terms carry idf 0.0 in the GLOBAL stats (no TermStatistics
        # in the reference either), so the plain sum is shard-independent
        idf_sum = sum(idfs.get(t, 0.0) for alts in slots for t in alts)
        if slop == 0:
            keys = None
            for off, pl in enumerate(slot_plists):
                ks = []
                for docs, freqs, _, positions, _ in pl:
                    doc_of_pos = np.repeat(docs, freqs)
                    pos_adj = positions - off
                    valid = pos_adj >= 0
                    ks.append(doc_of_pos[valid] * _POS_LIMIT + pos_adj[valid])
                k = np.unique(np.concatenate(ks))  # union + dedup per slot
                keys = k if keys is None else np.intersect1d(keys, k, assume_unique=True)
                if keys.size == 0:
                    return _EMPTY_I64, _EMPTY_F64
            match_docs, pf = np.unique(keys // _POS_LIMIT, return_counts=True)
            pf = pf.astype(np.float64)
        else:
            cand = None
            for pl in slot_plists:
                u = np.unique(np.concatenate([p[0] for p in pl]))
                cand = u if cand is None else np.intersect1d(cand, u, assume_unique=True)
                if cand.size == 0:
                    return _EMPTY_I64, _EMPTY_F64
            counts = self._multi_phrase_counts(slot_plists, cand, slop)
            nz = counts > 0
            match_docs, pf = cand[nz], counts[nz]
            if match_docs.size == 0:
                return _EMPTY_I64, _EMPTY_F64
        idx = np.searchsorted(d0, match_docs)
        norm_b = n0[idx]
        lead = slots[0][0]
        return match_docs, self._apply_sim(pf, norm_b, idf_sum, sim, lead)

    def _multi_phrase_counts(self, slot_plists, cand: np.ndarray, slop: int) -> np.ndarray:
        """Sloppy multi-phrase frequencies: per-slot position UNIONS feed
        the same greedy chain + sloppyWeight sum as `_phrase_counts`."""
        from .intervals import chain_spans

        all_counts = []
        for c0 in range(0, cand.size, self._IV_CHUNK):
            chunk = cand[c0 : c0 + self._IV_CHUNK]
            children = [self._slot_intervals(pl, chunk) for pl in slot_plists]
            idoc, s, e = chain_spans(children, minimal=False)
            if idoc.size:
                ml = (e - s) - (len(slot_plists) - 1)
                ok = ml <= slop
                counts = np.bincount(idoc[ok], weights=1.0 / (1.0 + ml[ok]), minlength=chunk.size)
            else:
                counts = np.zeros(chunk.size, np.float64)
            all_counts.append(counts)
        return np.concatenate(all_counts) if all_counts else np.zeros(0, np.float64)

    @staticmethod
    def _slot_intervals(pl: list[tuple], cand: np.ndarray):
        """Union of a slot's alternative term positions within cand docs,
        deduped (graph-analyzed indexes can put two alternatives at the
        same position) and (idoc, start)-sorted for chain_spans."""
        from .intervals import term_intervals

        parts = [term_intervals(lambda _t, _p=p: _p, "", cand) for p in pl]
        idoc = np.concatenate([x[0] for x in parts])
        pos = np.concatenate([x[1] for x in parts])
        if idoc.size:
            key = np.unique(idoc * _POS_LIMIT + pos)
            idoc, pos = key // _POS_LIMIT, key % _POS_LIMIT
        return idoc, pos, pos.copy()

    _IV_CHUNK = 1 << 18  # candidate chunk: keeps doc·L² composite keys in int64

    def _score_freq_docs(self, cand: np.ndarray, counts: np.ndarray, terms, idfs, sim):
        """Score docs with per-doc match frequencies like a phrase (summed
        idf over `terms`, norms from the first term that holds the doc)."""
        hit = counts > 0
        match_docs = cand[hit]
        pf_arr = counts[hit]
        if match_docs.size == 0:
            return _EMPTY_I64, _EMPTY_F64
        norm_b = np.full(match_docs.size, -1, dtype=np.int64)
        for t in terms:
            missing = norm_b < 0
            if not missing.any():
                break
            p = self._postings(t)
            if p is None:
                continue
            docs, norms = p[0], p[2]
            idx = np.clip(np.searchsorted(docs, match_docs), 0, max(docs.size - 1, 0))
            present = (docs[idx] == match_docs) if docs.size else np.zeros(match_docs.size, bool)
            fill = missing & present
            norm_b[fill] = norms[idx[fill]]
        idf_sum = sum(idfs.get(t, 0.0) for t in terms)
        nb_arr = np.maximum(norm_b, 0)
        scores = self._apply_sim(pf_arr, nb_arr, idf_sum, sim, terms[0])
        return match_docs, scores

    def _score_interval(self, node: QueryNode, idfs: dict[str, float], sim: str):
        """Intervals-lite: ordered/unordered minimal windows ≤ max_width —
        evaluated with the vectorized algebra over ALL candidate docs at
        once (no per-doc Python loop; chunked so composite keys stay int64)."""
        from . import intervals as IV

        terms = node.terms
        ordered = bool(node.min_should_match)
        tree = IV.maxwidth(
            node.max_edits,
            (IV.ordered if ordered else IV.unordered)(*[IV.iterm(t) for t in terms]),
        )
        return self._score_intervals_tree(tree, idfs, sim)

    def _score_intervals_tree(self, tree, idfs: dict[str, float], sim: str):
        """Full intervals algebra (search/intervals.py): candidates follow
        the tree's required-set structure (union under `or`, intersection
        under chains — IV.candidate_docs); freq = intervals per doc;
        scored like a phrase over the tree's leaf terms."""
        from . import intervals as IV

        provider = lambda t: self._postings(t, with_positions=True)  # noqa: E731
        cand = IV.candidate_docs(tree, provider)
        if cand.size == 0:
            return _EMPTY_I64, _EMPTY_F64
        all_docs, all_counts = [], []
        for c0 in range(0, cand.size, self._IV_CHUNK):
            chunk = cand[c0 : c0 + self._IV_CHUNK]
            idoc, _, _ = IV.eval_batch(tree, provider, chunk)
            counts = np.bincount(idoc, minlength=chunk.size) if idoc.size else np.zeros(chunk.size, np.int64)
            all_docs.append(chunk)
            all_counts.append(counts)
        cand = np.concatenate(all_docs)
        counts = np.concatenate(all_counts)
        return self._score_freq_docs(cand, counts, tree.leaf_terms(), idfs, sim)

    def _phrase_counts(self, terms, cand: np.ndarray, slop: int) -> np.ndarray:
        """Greedy-chain sloppy phrase frequencies for the candidate docs
        (position-verify stage, vectorized over docs via chain_spans):
        each match weighs 1/(1+matchLength) — Lucene's sloppyWeight — and
        the per-doc sum accumulates in p1 order (bincount input order),
        matching the oracle's sequential sum bit-for-bit.  slop=0 reduces
        to integral exact-phrase counts (weight 1)."""
        from .intervals import chain_spans, term_intervals

        provider = lambda t: self._postings(t, with_positions=True)  # noqa: E731
        all_counts = []
        for c0 in range(0, cand.size, self._IV_CHUNK):
            chunk = cand[c0 : c0 + self._IV_CHUNK]
            children = [term_intervals(provider, t, chunk) for t in terms]
            idoc, s, e = chain_spans(children, minimal=False)
            if idoc.size:
                ml = (e - s) - (len(terms) - 1)
                ok = ml <= slop
                counts = np.bincount(
                    idoc[ok], weights=1.0 / (1.0 + ml[ok]), minlength=chunk.size
                )
            else:
                counts = np.zeros(chunk.size, np.float64)
            all_counts.append(counts)
        return np.concatenate(all_counts) if all_counts else np.zeros(0, np.float64)

    def _score_sloppy(self, terms, plists, idfs, slop: int, sim: str = "bm25"):
        """Sloppy phrase: greedy chain count (proximity.sloppy_phrase_freq
        semantics) — vectorized over all candidate docs via chain_spans
        (loop over TERMS, never over docs)."""
        cand = plists[0][0]
        for p in plists[1:]:
            cand = np.intersect1d(cand, p[0], assume_unique=True)
            if cand.size == 0:
                return _EMPTY_I64, _EMPTY_F64
        counts = self._phrase_counts(terms, cand, slop)
        return self._score_freq_docs(cand, counts, terms, idfs, sim)

    def _eval_phrase_pruned(self, node: QueryNode, k: int, idfs: dict[str, float]):
        """Block-max-style pruning for the PHRASE path: the candidate set
        is the term conjunction; each candidate's score upper bound comes
        from the tightest available freq bound (min per-doc tf across terms
        for exact phrases — phrase freq can never exceed it; the leading
        term's tf for sloppy).  Position verification — the expensive part
        — runs only for the k best-bounded seeds and the θ-surviving docs.
        Result-identical to exhaustive evaluation."""
        terms, slop = node.terms, node.slop
        plists = []
        for t in terms:
            p = self._postings(t, with_positions=True)
            if p is None:
                return _EMPTY_I64, _EMPTY_F64
            plists.append(p)
        cand = None  # cost-ordered conjunction
        for p in sorted(plists, key=lambda p: p[0].size):
            cand = p[0] if cand is None else np.intersect1d(cand, p[0], assume_unique=True)
            if cand.size == 0:
                return _EMPTY_I64, _EMPTY_F64
        idf_sum = sum(idfs.get(t, 0.0) for t in terms)
        cache = self._cache_for(terms[0])
        norm_b = plists[0][2][np.searchsorted(plists[0][0], cand)]
        if slop == 0:
            ubf = None
            for docs_t, freqs_t, *_ in plists:
                f = freqs_t[np.searchsorted(docs_t, cand)]
                ubf = f if ubf is None else np.minimum(ubf, f)
        else:
            ubf = plists[0][1][np.searchsorted(plists[0][0], cand)]
        bounds = score_postings(ubf, norm_b, idf_sum, cache)

        def verify(sub_idx: np.ndarray):
            sub = cand[sub_idx]
            counts = self._phrase_counts(terms, sub, slop)
            hit = counts > 0
            scores = np.zeros(sub.size, dtype=np.float64)
            if hit.any():
                scores[hit] = score_postings(counts[hit], norm_b[sub_idx][hit], idf_sum, cache)
            return sub, scores, hit

        if cand.size <= k:
            sub, scores, hit = verify(np.arange(cand.size))
            return sub[hit], scores[hit]
        top_idx = np.sort(np.argpartition(-bounds, k - 1)[:k])
        _, seed_scores, _ = verify(top_idx)
        if seed_scores.size >= k:
            s32 = seed_scores.astype(np.float32)
            kth32 = np.partition(s32, s32.size - k)[s32.size - k]
            theta = float(np.nextafter(kth32, np.float32(-np.inf)))
        else:
            theta = 0.0
        keep_idx = np.flatnonzero(bounds >= theta)
        self._prune_candidates += int(cand.size)
        self._prune_survivors += int(keep_idx.size) + int(top_idx.size)
        sub, scores, hit = verify(keep_idx)
        return sub[hit], scores[hit]

    def _eval(self, node: QueryNode, idfs: dict[str, float], sim: str = "bm25"):
        """→ (sorted matching docs, float64 scores).  node.boost multiplies
        the result (BoostQuery semantics)."""
        docs, scores = self._eval_unboosted(node, idfs, sim)
        if node.boost != 1.0 and scores.size:
            scores = scores * node.boost
        return docs, scores

    def _eval_unboosted(self, node: QueryNode, idfs: dict[str, float], sim: str = "bm25"):
        if node.kind == "match_all":
            fd, _ = self._load_docmap()  # every doc in this actor's range
            docs = fd.astype(np.int64)
            live = self._live_mask(docs)
            if live is not None:
                docs = docs[live]
            return docs, np.ones(docs.size, dtype=np.float64)
        if node.kind == "term":
            return self._score_term(node.terms[0], idfs, sim)
        if node.kind == "phrase":
            return self._score_phrase(node.terms, idfs, slop=node.slop, sim=sim)
        if node.kind == "multi_phrase":
            return self._score_multi_phrase(node.slots, idfs, slop=node.slop, sim=sim)
        if node.kind == "synonym":
            return self._score_synonym(node.terms, idfs, sim)
        if node.kind == "interval":
            return self._score_interval(node, idfs, sim)
        if node.kind == "intervals":
            return self._score_intervals_tree(node.tree, idfs, sim)
        if node.kind == "term_range":
            return self._eval_term_range(node)
        if node.kind == "term_set":
            # TermInSetQuery: constant-score union of member postings
            parts = [p[0] for t in node.terms if (p := self._postings(t)) is not None]
            if not parts:
                return _EMPTY_I64, _EMPTY_F64
            docs = np.unique(np.concatenate(parts))
            return docs, np.ones(docs.size, dtype=np.float64)
        if node.kind == "covering":
            # CoveringQuery (lucene/sandbox/.../search/CoveringQuery.java):
            # doc matches iff #matching SHOULD children >= a PER-DOC long
            # value (node.pattern names the numeric doc-values field);
            # score = sum of the matching children's scores
            results = [self._eval(c, idfs, sim) for _, c in node.clauses]
            results = [r for r in results if r[0].size]
            if not results:
                return _EMPTY_I64, _EMPTY_F64
            all_docs = np.concatenate([d for d, _ in results])
            docs, inv_all = np.unique(all_docs, return_inverse=True)
            sm = np.zeros(docs.size, dtype=np.float64)
            cnt = np.zeros(docs.size, dtype=np.int64)
            off = 0
            for d, s in results:
                idx = inv_all[off : off + d.size]
                np.add.at(sm, idx, s)
                np.add.at(cnt, idx, 1)
                off += d.size
            dv = self._load_numeric_dv(node.pattern)
            if dv is None:
                raise KeyError(f"unknown numeric doc-values field {node.pattern!r}")
            fd, fv = dv
            need = fv[np.searchsorted(fd, docs)]
            keep = cnt >= need
            return docs[keep], sm[keep]
        if node.kind == "dismax":
            # DisjunctionMaxQuery: max(child) + tiebreak·Σ(non-max children)
            results = [self._eval(c, idfs, sim) for _, c in node.clauses]
            results = [r for r in results if r[0].size]
            if not results:
                return _EMPTY_I64, _EMPTY_F64
            all_docs = np.concatenate([d for d, _ in results])
            docs, inv_all = np.unique(all_docs, return_inverse=True)
            mx = np.zeros(docs.size, dtype=np.float64)
            sm = np.zeros(docs.size, dtype=np.float64)
            off = 0
            for d, s in results:
                idx = inv_all[off : off + d.size]
                np.maximum.at(mx, idx, s)
                np.add.at(sm, idx, s)
                off += d.size
            return docs, mx + node.tiebreak * (sm - mx)
        musts, shoulds, nots, filters = [], [], [], []
        for occ, child in node.clauses:
            r = self._eval(child, idfs, sim)
            bucket = {"MUST": musts, "SHOULD": shoulds, "MUST_NOT": nots, "FILTER": filters}[occ]
            bucket.append(r)
        if not musts and not shoulds and not filters:
            return _EMPTY_I64, _EMPTY_F64
        if musts:
            # base = ∩ MUSTs: the INTERSECTION leads with the smallest doc
            # list (ConjunctionDISI cost ordering / the IndexOrDocValuesQuery
            # lead-cost model — cheapest clause drives); scores are then
            # gathered in CLAUSE order so float summation matches the oracle
            if len(musts) > 1:
                docs = None
                for d2, _ in sorted(musts, key=lambda m: m[0].size):
                    docs = d2 if docs is None else np.intersect1d(docs, d2, assume_unique=True)
                    if docs.size == 0:
                        break
                scores = np.zeros(docs.size, dtype=np.float64)
                for d2, s2 in musts:  # clause order — float parity
                    idx = np.searchsorted(d2, docs)
                    scores += s2[idx]
            else:
                docs, scores = musts[0]
            should_cnt = np.zeros(docs.size, dtype=np.int64)
            for d2, s2 in shoulds:
                if d2.size == 0 or docs.size == 0:
                    continue
                idx_c = np.clip(np.searchsorted(d2, docs), 0, d2.size - 1)
                hit = d2[idx_c] == docs
                add = np.zeros(docs.size, dtype=np.float64)
                add[hit] = s2[idx_c[hit]]
                scores = scores + add
                should_cnt += hit
            if node.min_should_match > 0 and shoulds:
                keep = should_cnt >= node.min_should_match
                docs, scores = docs[keep], scores[keep]
        elif shoulds:
            # no MUST: at least one SHOULD must match (BooleanWeight rule);
            # min_should_match raises that threshold
            all_docs = np.concatenate([d for d, _ in shoulds])
            all_scores = np.concatenate([s for _, s in shoulds])
            docs, inv = np.unique(all_docs, return_inverse=True)
            scores = np.zeros(docs.size, dtype=np.float64)
            np.add.at(scores, inv, all_scores)
            if node.min_should_match > 1:
                counts = np.bincount(inv, minlength=docs.size)
                keep = counts >= node.min_should_match
                docs, scores = docs[keep], scores[keep]
        else:
            # pure FILTER query: constant score 0
            docs = filters[0][0]
            scores = np.zeros(docs.size, dtype=np.float64)
            filters = filters[1:]
        # FILTER = MUST without scoring (BooleanClause.Occur.FILTER)
        for d2, _ in filters:
            docs, i1, _ = np.intersect1d(docs, d2, assume_unique=True, return_indices=True)
            scores = scores[i1]
        for d2, _ in nots:
            if d2.size and docs.size:
                keep = ~np.isin(docs, d2, assume_unique=True)
                docs, scores = docs[keep], scores[keep]
        return docs, scores

    # -- public API --------------------------------------------------------
    def match_all(self, node: QueryNode, idfs: dict[str, float], sim: str = "bm25"):
        """ALL matching (docs, float64 scores) — feeds parent-block joins
        and delete-by-query, where every child hit matters."""
        return self._eval(node, idfs, sim)

    def join_values(self, node: QueryNode, idfs: dict[str, float], field: str, sim: str = "bm25") -> list:
        """JoinQParserPlugin from-side (solr/core/src/java/org/apache/solr/
        search/JoinQParserPlugin.java): evaluate the from-query shard-local,
        gather the `field` doc values of every matching live doc, and return
        this shard's UNIQUE value set — only distinct join keys cross the
        wire (JoinQuery's from-side term enumeration).  Cached per
        (query, field) in the shard's result cache — Solr's join caches the
        resolved DocSet the same way — so repeated {!join}s and multi-hop
        {!graph} frontiers skip re-evaluation.  The caller's idf weights
        are part of the key (sorted items — the per-query dict is small):
        score partials depend on them, and a caller passing different
        weights for the same node (e.g. after a stats-generation flip)
        must not see stale partials."""
        cache_key = ("join_values", repr(node), field, sim, tuple(sorted(idfs.items())))
        hit = self._result_cache.get(cache_key)
        if hit is not None:
            return hit
        docs, scores = self._eval(node, idfs, sim)
        dv = self._load_docvalues(field)
        if dv is None or docs.size == 0:
            return []
        fd, fv = dv
        vals = fv[np.searchsorted(fd, docs)]
        # per-key score partials for JoinUtil's ScoreMode (lucene/join/src/
        # java/org/apache/lucene/search/join/ScoreMode.java): (sum64,
        # count, max32), accumulated in docID order within the shard
        # (bincount is sequential), merged on the driver in shard order —
        # deterministic for a given layout; max/count are order-free.
        import pandas as pd

        keep = np.array([v is not None for v in vals.tolist()], dtype=bool)
        vals, s64 = vals[keep], scores[keep].astype(np.float32).astype(np.float64)
        if not vals.size:
            self._result_cache.put(cache_key, [])
            return []
        codes, uniq = pd.factorize(vals)
        sums = np.bincount(codes, weights=s64)
        counts = np.bincount(codes)
        maxs = np.full(len(uniq), -np.inf)
        np.maximum.at(maxs, codes, s64)
        out = sorted(
            (v, float(s), int(c), float(m))
            for v, s, c, m in zip(uniq.tolist(), sums, counts, maxs)
        )
        self._result_cache.put(cache_key, out)
        return out

    def count_matches(self, node: QueryNode, idfs: dict[str, float], sim: str = "bm25") -> int:
        """numFound for this shard — only the hit COUNT crosses the wire
        (feeds SpellCheckCollator verification and rows=0 counting queries)."""
        docs, _ = self._eval(node, idfs, sim)
        return int(docs.size)

    def facet_query_counts(self, node: QueryNode, idfs: dict[str, float], subs: list) -> list:
        """facet.query (SimpleFacets.getFacetQueryCounts): hit count of
        each sub-query INTERSECTED with the base query's DocSet — the base
        evaluates once per shard, each sub once, and only the counts cross
        the wire."""
        base, _ = self._eval(node, idfs, "bm25")
        out = []
        for sn, sidfs in subs:
            if sn is None or base.size == 0:
                out.append(0)
                continue
            sd, _ = self._eval(sn, sidfs, "bm25")
            out.append(int(np.intersect1d(base, sd, assume_unique=True).size))
        return out

    def explain(self, node: QueryNode, doc: int, idfs: dict[str, float], sim: str = "bm25"):
        """Score explanation for one doc (Lucene's IndexSearcher.explain /
        Solr debugQuery): per-leaf-term contribution + the node total, or
        None if the doc doesn't match or lives outside this shard."""
        docs, scores = self._eval(node, idfs, sim)
        i = np.searchsorted(docs, doc)
        if i >= docs.size or docs[i] != doc:
            return None
        detail: dict[str, float] = {}
        for t in dict.fromkeys(node.all_terms()):
            td, ts = self._score_term(t, idfs, sim)
            j = np.searchsorted(td, doc)
            if j < td.size and td[j] == doc:
                detail[t] = float(ts[j])
        return {"total": float(scores[i]), "terms": detail}

    def set_docmap_paths(self, paths: list[str]) -> None:
        """Per-pid norms/docmap segments covering this actor's doc range —
        enables shard-local parent aggregation (conv blocks never span
        doc-range shards under conv-range partitioning)."""
        self._docmap_paths = list(paths)
        self._docmap = None

    # -- TermRange via the IndexOrDocValues cost model ---------------------
    # lucene/core/src/java/org/apache/lucene/search/IndexOrDocValuesQuery
    # .java: the same predicate is answerable from the term index (union of
    # matching postings, cost ≈ Σ df) or from the doc-values column (full
    # column scan, cost ≈ maxDoc); pick by estimated cost.
    RANGE_SCAN_FRACTION = 8  # index wins when Σ df ≤ maxDoc / 8

    def top_k_collapse(
        self,
        node: QueryNode,
        field: str,
        k: int,
        idfs: dict[str, float],
        sim: str = "bm25",
        sel_op: str | None = None,
        sel_field: str | None = None,
        null_policy: str = "ignore",
    ):
        """Shard-local query-time collapse (solr/core/.../search/
        CollapsingQParserPlugin.java): evaluate ALL matching docs, keep the
        group head per `field` doc-value group — by (score desc, docID asc)
        by default, or by min/max of a NUMERIC doc-values field when
        `sel_op`/`sel_field` are set (the plugin's min=/max= selectors; the
        head still carries its QUERY score for ranking).  `null_policy`:
        ignore drops field-less docs, expand lets each compete as its own
        group (top-k cut per shard is safe — singleton groups), collapse
        folds them into ONE null group (one head per shard).  Returns at
        most one (doc, score, group[, selector value]) per group PER SHARD
        — the driver merge is bounded by the group domain (+k for expand),
        never the hit count."""
        docs, scores = self._eval(node, idfs, sim)
        empty = (_EMPTY_I64, _EMPTY_F64, np.empty(0, dtype=object), _EMPTY_F64)
        if not docs.size:
            return empty
        dv = self._load_docvalues(field)
        if dv is None:
            return empty
        fd, fv = dv
        vals = fv[np.searchsorted(fd, docs)]
        keep = np.array([v is not None for v in vals.tolist()], dtype=bool)
        nd_, ns_ = docs[~keep], scores[~keep].astype(np.float32)  # null-group docs
        docs, scores, vals = docs[keep], scores[keep].astype(np.float32), vals[keep]

        def with_nulls(res):
            if null_policy == "ignore" or not nd_.size:
                return res
            order = np.lexsort((nd_, -ns_))
            order = order[:1] if null_policy == "collapse" else order[:k]
            return (
                np.concatenate([res[0], nd_[order]]),
                np.concatenate([res[1], ns_[order]]),
                np.concatenate([res[2], np.full(order.size, None, dtype=object)]),
                np.concatenate([res[3], np.zeros(order.size)]),
            )

        if not docs.size:
            return with_nulls(empty)
        if sel_op is None:
            # best per group: (score desc, doc asc) order, first per value
            order = np.lexsort((docs, -scores))
            selv_sorted = None
        else:
            ndv = self._load_numeric_dv(sel_field)
            if ndv is None:
                raise KeyError(f"unknown numeric doc-values field {sel_field!r}")
            nd, nv = ndv
            selv = nv[np.searchsorted(nd, docs)]
            order = np.lexsort((docs, selv if sel_op == "min" else -selv))
            selv_sorted = selv[order]
        docs, scores, vals = docs[order], scores[order], vals[order]
        codes, _ = __import__("pandas").factorize(vals)
        _, first_idx = np.unique(codes, return_index=True)  # first hit per
        sel = np.sort(first_idx)  # group in head order — vectorized
        out_sel = selv_sorted[sel] if selv_sorted is not None else np.zeros(sel.size)
        # shard-local top-k groups is NOT safe to cut (another shard may
        # beat a group's best) — return all group winners (domain-bounded)
        return with_nulls((docs[sel], scores[sel], vals[sel], out_sel))

    def export_shard_sorted(
        self,
        node: QueryNode,
        idfs: dict[str, float],
        sort_field: str,
        asc: bool,
        fl: list[str],
        out_dir: str,
    ):
        """/export handler shard half (solr/core/.../handler/export/
        ExportWriter.java): this shard's FULL match set sorted by a
        numeric dv field, written straight to a parquet part — rows never
        cross the wire; only the part path returns.  `fl` adds numeric dv
        columns."""
        import os

        docs, _ = self._eval(node, idfs, "bm25")
        if not docs.size:
            return None
        ndv = self._load_numeric_dv(sort_field)
        if ndv is None:
            raise KeyError(f"unknown numeric doc-values field {sort_field!r}")
        fd, fv = ndv
        vals = fv[np.searchsorted(fd, docs)]
        order = np.lexsort((docs, vals if asc else -vals))
        cols = {"doc_id": docs[order], sort_field: vals[order]}
        for f in fl:
            if f == sort_field:
                continue
            xdv = self._load_numeric_dv(f)
            if xdv is None:
                raise KeyError(f"unknown fl field {f!r}")
            cols[f] = xdv[1][np.searchsorted(xdv[0], docs)][order]
        import uuid

        import pyarrow as pa

        os.makedirs(out_dir, exist_ok=True)
        tag = uuid.uuid4().hex[:12]
        path = os.path.join(out_dir, f"part-{tag}.parquet")
        tmp = os.path.join(out_dir, f".part-{tag}.tmp")
        pq.write_table(pa.table(cols), tmp)
        os.replace(tmp, path)
        return path

    def expand_members(
        self,
        node: QueryNode,
        idfs: dict[str, float],
        sim: str,
        field: str,
        group_vals: list,
        exclude: list,
        limit: int,
    ):
        """ExpandComponent (solr/core/.../handler/component/ExpandComponent
        .java): for the GIVEN collapsed head groups, this shard's top
        `limit` OTHER matching members per group by (score desc, docID
        asc).  Bounded: at most |groups|·limit rows leave the shard."""
        docs, scores = self._eval(node, idfs, sim)
        if not docs.size:
            return None
        dv = self._load_docvalues(field)
        if dv is None:
            return None
        fd, fv = dv
        vals = fv[np.searchsorted(fd, docs)]
        want = set(group_vals)
        keep = np.array([v in want for v in vals.tolist()], dtype=bool)
        if exclude:
            keep &= ~np.isin(docs, np.asarray(exclude, dtype=np.int64))
        if not keep.any():
            return None
        docs, scores, vals = docs[keep], scores[keep].astype(np.float32), vals[keep]
        import pandas as pd

        df = pd.DataFrame({"doc": docs, "score": scores, "val": vals})
        df = df.sort_values(["score", "doc"], ascending=[False, True], kind="mergesort")
        return df.groupby("val", sort=False).head(limit)

    def facet_counts(self, node: QueryNode, idfs: dict[str, float], field: str, sim: str = "bm25"):
        """Per-shard facet partial over the MATCH SET of `node` (the
        /select?q=...&facet.field=... path — SimpleFacets over a DocSet):
        → (values, counts), bounded by the field's value domain.  Docs
        without a value are skipped (facet.missing stays a pipeline-side
        concern)."""
        docs, _ = self._eval(node, idfs, sim)
        if not docs.size:
            return np.empty(0, dtype=object), _EMPTY_I64, 0
        dv = self._load_docvalues(field)
        if dv is None:
            # no dv column at all: every match counts as missing
            return np.empty(0, dtype=object), _EMPTY_I64, int(docs.size)
        fd, fv = dv
        vals = fv[np.searchsorted(fd, docs)]
        keep = np.array([v is not None for v in vals.tolist()], dtype=bool)
        n_missing = int((~keep).sum())
        if not keep.any():
            return np.empty(0, dtype=object), _EMPTY_I64, n_missing
        uniq, cnt = np.unique(vals[keep].astype(str), return_counts=True)
        return uniq.astype(object), cnt.astype(np.int64), n_missing

    def facet_pair_counts(
        self, node: QueryNode, idfs: dict[str, float], field1: str, field2: str, sim: str = "bm25"
    ):
        """Nested-terms facet partial over the match set (json.facet
        {type:terms, field: f1, facet:{sub:{type:terms, field: f2}}} on
        the /select path): per-shard (v1, v2) → count, bounded by the
        value-domain product.  Docs missing EITHER field drop (the nested
        bucket only counts docs that have a sub value; parent totals come
        from facet_counts)."""
        return self.facet_tuple_counts(node, idfs, [field1, field2], sim)

    def facet_tuple_counts(
        self, node: QueryNode, idfs: dict[str, float], fields: list[str], sim: str = "bm25"
    ):
        """N-level pivot partial (facet.pivot over the query DocSet —
        PivotFacetProcessor on the index path): per-shard value-tuple →
        count over docs carrying EVERY field, bounded by the domain
        product.  → frame (v0..vN-1, n) or None."""
        docs, _ = self._eval(node, idfs, sim)
        if not docs.size:
            return None
        cols = {}
        for i, f in enumerate(fields):
            dv = self._load_docvalues(f)
            if dv is None:
                return None
            cols[f"v{i}"] = dv[1][np.searchsorted(dv[0], docs)]
        keep = np.ones(docs.size, dtype=bool)
        for v in cols.values():
            keep &= np.array([x is not None for x in v.tolist()], dtype=bool)
        if not keep.any():
            return None
        import pandas as pd

        df = pd.DataFrame({k: v[keep].astype(str) for k, v in cols.items()})
        keys = [f"v{i}" for i in range(len(fields))]
        return df.groupby(keys, as_index=False).size().rename(columns={"size": "n"})

    def range_facet_counts(
        self,
        node: QueryNode,
        idfs: dict[str, float],
        field: str,
        start: float,
        end: float,
        gap: float,
        sim: str = "bm25",
    ):
        """Per-shard range-facet partial over the match set (facet.range /
        RangeFacetProcessor): fixed [start, end) buckets of width `gap`,
        plus before/after counts — a bounded (n_buckets+2) int64 vector."""
        n_buckets = int(np.ceil((end - start) / gap))
        counts = np.zeros(n_buckets + 2, dtype=np.int64)  # [before, buckets..., after]
        docs, _ = self._eval(node, idfs, sim)
        if not docs.size:
            return counts
        dv = self._load_numeric_dv(field)
        if dv is None:
            raise KeyError(f"unknown numeric doc-values field {field!r}")
        fd, fv = dv
        vals = fv[np.searchsorted(fd, docs)]
        before = vals < start
        after = vals >= start + n_buckets * gap
        mid = ~(before | after)
        counts[0] = int(before.sum())
        counts[-1] = int(after.sum())
        if mid.any():
            idx = ((vals[mid] - start) // gap).astype(np.int64)
            counts[1:-1] += np.bincount(idx, minlength=n_buckets)
        return counts

    def stats_partial(
        self, node: QueryNode, idfs: dict[str, float], field: str, sim: str = "bm25",
        with_digest: bool = False,
    ):
        """Per-shard StatsComponent partial over the match set: (count,
        Σx, Σx², min, max) with the sums in EXACT int64 arithmetic when the
        doc-values column is integral (turn_idx, dl) — partials merge
        exactly in any order, so the driver result is deterministic.
        `with_digest=True` appends the t-digest centroid arrays (stats.
        percentiles) so ONE scatter carries both — the query evaluates
        once."""
        docs, _ = self._eval(node, idfs, sim)
        if not docs.size:
            return (0, 0, 0, None, None) + ((None,) if with_digest else ())
        dv = self._load_numeric_dv(field)
        if dv is None:
            raise KeyError(f"unknown numeric doc-values field {field!r}")
        fd, fv = dv
        vals = fv[np.searchsorted(fd, docs)]
        iv = vals.astype(np.int64)
        if not np.array_equal(iv.astype(np.float64), vals):
            raise ValueError(f"stats over non-integral doc values field {field!r} unsupported")
        out = (
            int(docs.size),
            int(iv.sum(dtype=object)),
            int((iv.astype(object) * iv.astype(object)).sum()),
            int(iv.min()),
            int(iv.max()),
        )
        if with_digest:
            from ..state.tdigest import TDigest

            td = TDigest.of(vals)
            out = out + ((td.means, td.weights),)
        return out

    def top_groups(self, node: QueryNode, idfs: dict[str, float], field: str, j: int, sim: str = "bm25"):
        """Per-shard grouped-search partial (grouping collectors, SURVEY
        §2.6: FirstPassGroupingCollector + TopGroupsCollector in one pass):
        top-j hits per `field` doc-value group by (score desc, docID asc).
        → (docs, float32 scores, group values), ≤ j rows per group per
        shard — driver merge is (groups × j × shards)-bounded."""
        docs, scores = self._eval(node, idfs, sim)
        empty = (_EMPTY_I64, np.empty(0, np.float32), np.empty(0, dtype=object))
        if not docs.size:
            return empty
        dv = self._load_docvalues(field)
        if dv is None:
            return empty
        fd, fv = dv
        vals = fv[np.searchsorted(fd, docs)]
        keep = np.array([v is not None for v in vals.tolist()], dtype=bool)
        docs, scores, vals = docs[keep], scores[keep].astype(np.float32), vals[keep]
        if not docs.size:
            return empty
        order = np.lexsort((docs, -scores))
        docs, scores, vals = docs[order], scores[order], vals[order]
        codes, _ = __import__("pandas").factorize(vals)
        # rank within group: stable-sort by group preserves the rank order
        by_grp = np.argsort(codes, kind="stable")
        grp_sorted = codes[by_grp]
        starts = np.flatnonzero(np.concatenate(([True], grp_sorted[1:] != grp_sorted[:-1])))
        width = np.arange(grp_sorted.size) - np.repeat(starts, np.diff(np.append(starts, grp_sorted.size)))
        sel = np.sort(by_grp[width < j])  # back to global rank order
        return docs[sel], scores[sel], vals[sel]

    def top_groups_sorted(
        self, node: QueryNode, idfs: dict[str, float], field: str, j: int,
        sort_field: str, sort_asc: bool, sim: str = "bm25",
    ):
        """group.sort=<numeric dv field> asc|desc (TopGroupsCollector with
        withinGroupSort ≠ main sort): per group this shard returns its top-j
        docs BY THE GROUP SORT plus the group's best (score, doc) for group
        ranking (groups still rank by their best hit under the main score
        sort).  → (docs, scores, group vals, sort vals, gmax, gdoc)."""
        docs, scores = self._eval(node, idfs, sim)
        if not docs.size:
            return None
        dv = self._load_docvalues(field)
        ndv = self._load_numeric_dv(sort_field)
        if dv is None:
            return None
        if ndv is None:
            raise KeyError(f"unknown numeric doc-values field {sort_field!r}")
        fd, fv = dv
        vals = fv[np.searchsorted(fd, docs)]
        keep = np.array([v is not None for v in vals.tolist()], dtype=bool)
        if not keep.any():
            return None
        docs, scores, vals = docs[keep], scores[keep].astype(np.float32), vals[keep]
        nd, nv = ndv
        sv = nv[np.searchsorted(nd, docs)]
        import pandas as pd

        df = pd.DataFrame({"doc": docs, "score": scores, "val": vals, "sv": sv})
        best = df.sort_values(["score", "doc"], ascending=[False, True], kind="mergesort").drop_duplicates("val")
        gmax = dict(zip(best["val"], best["score"]))
        gdoc = dict(zip(best["val"], best["doc"]))
        df = df.sort_values(["sv", "doc"], ascending=[sort_asc, True], kind="mergesort")
        df = df.groupby("val", sort=False).head(j)
        df["gmax"] = df["val"].map(gmax).astype(np.float32)
        df["gdoc"] = df["val"].map(gdoc).astype(np.int64)
        return df

    def facet_stats_partial(
        self, node: QueryNode, idfs: dict[str, float], field: str, stat_field: str, sim: str = "bm25"
    ):
        """Per-shard terms-facet-with-sub-stats partial over the match set
        (json.facet {type:terms, facet:{...}} on the index path): for each
        `field` value, (count, Σx, min, max) of `stat_field` in exact
        int64 — value-domain-bounded, order-independent merge."""
        docs, _ = self._eval(node, idfs, sim)
        if not docs.size:
            return []
        dv = self._load_docvalues(field)
        ndv = self._load_numeric_dv(stat_field)
        if dv is None:
            return []
        if ndv is None:
            raise KeyError(f"unknown numeric doc-values field {stat_field!r}")
        fd, fv = dv
        vals = fv[np.searchsorted(fd, docs)]
        nd, nv = ndv
        x = nv[np.searchsorted(nd, docs)]
        keep = np.array([v is not None for v in vals.tolist()], dtype=bool)
        vals, x = vals[keep], x[keep]
        if not vals.size:
            return []
        ix = x.astype(np.int64)
        if not np.array_equal(ix.astype(np.float64), x):
            raise ValueError(f"facet stats over non-integral field {stat_field!r} unsupported")
        codes, uniq = __import__("pandas").factorize(vals)
        cnt = np.bincount(codes)
        s = np.bincount(codes, weights=ix).astype(np.int64)  # exact ≤ 2^53 per shard
        mn = np.full(uniq.size, np.iinfo(np.int64).max)
        mx = np.full(uniq.size, np.iinfo(np.int64).min)
        np.minimum.at(mn, codes, ix)
        np.maximum.at(mx, codes, ix)
        return [
            (str(uniq[i]), int(cnt[i]), int(s[i]), int(mn[i]), int(mx[i]))
            for i in range(uniq.size)
        ]

    def _load_docvalues(self, field: str):
        """(doc_id, value) doc-values column for a keyword field, loaded
        once from the norms segments (the SortedDocValues analog)."""
        cache = getattr(self, "_dv_cache", None)
        if cache is None:
            cache = self._dv_cache = {}
        if field not in cache:
            import pyarrow as pa

            col = f"dv_{field}"
            tables = []
            for p in self._docmap_paths:
                if col in pq.read_schema(p).names:
                    tables.append(pq.read_table(p, columns=["doc_id", col]))
            if not tables:
                cache[field] = None
            else:
                t = pa.concat_tables(tables).sort_by("doc_id")
                cache[field] = (
                    t.column("doc_id").to_numpy(),
                    t.column(col).to_numpy(zero_copy_only=False),
                )
        return cache[field]

    def _load_numeric_dv(self, field: str):
        """(doc_id, float64 values) for a NUMERIC per-doc column (turn_idx,
        dl, norm_byte) from the norms segments — the DoubleValuesSource a
        FunctionScoreQuery reads (lucene/core/.../search/DoubleValues
        Source.java).  Per-pid `dv_updates.parquet` sidecars (in-place
        numeric doc-values updates, Lucene updateNumericDocValue) overlay
        the base column at load."""
        cache = getattr(self, "_ndv_cache", None)
        if cache is None:
            cache = self._ndv_cache = {}
        if field not in cache:
            import os

            import pyarrow as pa

            tables = []
            overlays = []
            for p in self._docmap_paths:
                sch = pq.read_schema(p)
                if field in sch.names and sch.field(field).type.id not in (13, 14):  # not string/binary
                    tables.append(pq.read_table(p, columns=["doc_id", field]))
                    side = os.path.join(os.path.dirname(p), "dv_updates.parquet")
                    if os.path.exists(side):
                        u = pq.read_table(side)
                        m = np.asarray(u.column("field").to_pylist(), dtype=object) == field
                        if m.any():
                            overlays.append(
                                (
                                    u.column("doc_id").to_numpy()[m],
                                    u.column("value").to_numpy()[m].astype(np.float64),
                                )
                            )
            if not tables:
                cache[field] = None
            else:
                t = pa.concat_tables(tables).sort_by("doc_id")
                dd = t.column("doc_id").to_numpy()
                vv = t.column(field).to_numpy().astype(np.float64).copy()
                for ud, uv in overlays:
                    pos = np.searchsorted(dd, ud)
                    ok = (pos < dd.size) & (dd[np.minimum(pos, dd.size - 1)] == ud)
                    vv[pos[ok]] = uv[ok]
                cache[field] = (dd, vv)
        return cache[field]

    def apply_dv_updates(self, field: str, docs: list[int], vals: list[float]) -> int:
        """Live half of the in-place numeric doc-values update: patch the
        loaded cache for `field` (a cold cache loads THROUGH the sidecar
        the Searcher just wrote, so the patch is idempotent either way).
        Returns the number of docs this actor owns."""
        dv = self._load_numeric_dv(field)
        if dv is None:
            return 0
        dd, vv = dv
        ud = np.asarray(docs, dtype=np.int64)
        uv = np.asarray(vals, dtype=np.float64)
        pos = np.searchsorted(dd, ud)
        ok = (pos < dd.size) & (dd[np.minimum(pos, dd.size - 1)] == ud)
        vv[pos[ok]] = uv[ok]
        return int(ok.sum())

    def _expr_columns(self, expr, docs: np.ndarray):
        """Materialize an expression's inputs for the GIVEN doc vector:
        termfreq('term') becomes a per-doc tf array from this shard's
        postings (Solr's TermFreqValueSource — tombstone mask inherited
        from the decode), every other field loads from numeric doc-values.
        → (rewritten expr, columns dict)."""
        from ..functions.scalar import Expr, expr_fields, transform_calls

        cols: dict[str, np.ndarray] = {}
        n = [0]

        def repl(c):
            if c.name == "termfreq" and len(c.args) == 1 and c.args[0].kind == "str":
                key = f"__tf{n[0]}"
                n[0] += 1
                arr = np.zeros(docs.size, dtype=np.float64)
                p = self._postings(c.args[0].name)
                if p is not None and p[0].size:
                    td, tf = p[0], p[1]
                    pos = np.clip(np.searchsorted(td, docs), 0, td.size - 1)
                    ok = td[pos] == docs
                    arr[ok] = tf[pos[ok]]
                cols[key] = arr
                return Expr("field", name=key)
            return None

        expr = transform_calls(expr, repl)
        for f in expr_fields(expr):
            if f in cols:
                continue
            dv = self._load_numeric_dv(f)
            if dv is None:
                raise KeyError(f"unknown numeric doc-values field {f!r}")
            fd, fv = dv
            cols[f] = fv[np.searchsorted(fd, docs)]
        return expr, cols

    def top_k_boosted(self, node: QueryNode, k: int, idfs: dict[str, float], expr_src: str, sim: str = "bm25"):
        """`{!boost b=expr}` (solr/core/.../search/BoostQParserPlugin.java
        → FunctionScoreQuery.boostByValue): score × per-doc function value,
        multiplied in float64 BEFORE the float32 cast.  Pruning stays off —
        WAND's score bounds don't survive a per-doc multiplier (Lucene
        routes function-scored queries outside WAND too)."""
        from ..functions.scalar import evaluate, parse_expr

        docs, scores = self._eval(node, idfs, sim)
        if docs.size == 0:
            return _EMPTY_I64, np.empty(0, np.float32)
        expr, cols = self._expr_columns(parse_expr(expr_src), docs)
        boosted = scores * np.broadcast_to(np.asarray(evaluate(expr, cols), np.float64), scores.shape)
        scores32 = boosted.astype(np.float32)
        if docs.size > k:
            thresh = scores32[np.argpartition(-scores32, k - 1)[k - 1]]
            cand = np.flatnonzero(scores32 >= thresh)
            order = np.lexsort((docs[cand], -scores32[cand]))[:k]
            sel = cand[order]
            return docs[sel], scores32[sel]
        order = np.lexsort((docs, -scores32))
        return docs[order], scores32[order]

    def top_k_franged(
        self,
        node: QueryNode,
        k: int,
        idfs: dict[str, float],
        expr_src: str,
        lo: float | None,
        hi: float | None,
        incl: bool,
        incu: bool,
        sim: str = "bm25",
    ):
        """`fq={!frange l= u=}expr` on the index path (solr/core/.../search/
        FunctionRangeQuery + FunctionRangeQParserPlugin): keep only hits
        whose per-doc function value lies in [l, u] (bounds optional,
        incl/incu control closedness), then shard top-k by the UNCHANGED
        query score.  Pruning is off — the filter can drop any prefix of
        the score order, so WAND bounds don't hold."""
        docs, scores = self._franged_hits(node, idfs, expr_src, lo, hi, incl, incu, sim)
        if docs.size == 0:
            return _EMPTY_I64, np.empty(0, np.float32)
        scores32 = scores.astype(np.float32)
        if docs.size > k:
            thresh = scores32[np.argpartition(-scores32, k - 1)[k - 1]]
            cand = np.flatnonzero(scores32 >= thresh)
            order = np.lexsort((docs[cand], -scores32[cand]))[:k]
            sel = cand[order]
            return docs[sel], scores32[sel]
        order = np.lexsort((docs, -scores32))
        return docs[order], scores32[order]

    def count_franged(
        self,
        node: QueryNode,
        idfs: dict[str, float],
        expr_src: str,
        lo: float | None,
        hi: float | None,
        incl: bool,
        incu: bool,
        sim: str = "bm25",
    ) -> int:
        """numFound for a {!frange}-filtered query: the top_k_franged mask
        evaluated shard-side, only the COUNT crosses the wire (the
        handle_select exotic-fq path no longer materializes ids)."""
        docs, _ = self._franged_hits(node, idfs, expr_src, lo, hi, incl, incu, sim)
        return int(docs.size)

    def _franged_hits(
        self,
        node: QueryNode,
        idfs: dict[str, float],
        expr_src: str,
        lo: float | None,
        hi: float | None,
        incl: bool,
        incu: bool,
        sim: str,
    ):
        """The ONE frange mask kernel (FunctionRangeQuery): evaluate the
        query, compute the per-doc function value, keep hits in the
        [l, u] window — shared by top_k_franged (page) and count_franged
        (numFound) so closedness/column-resolution semantics can never
        diverge between count and page."""
        from ..functions.scalar import evaluate, parse_expr

        docs, scores = self._eval(node, idfs, sim)
        if docs.size == 0:
            return _EMPTY_I64, _EMPTY_F64
        expr, cols = self._expr_columns(parse_expr(expr_src), docs)
        vals = np.broadcast_to(np.asarray(evaluate(expr, cols), np.float64), scores.shape)
        mask = np.ones(docs.size, dtype=bool)
        if lo is not None:
            mask &= (vals >= lo) if incl else (vals > lo)
        if hi is not None:
            mask &= (vals <= hi) if incu else (vals < hi)
        return docs[mask], scores[mask]

    def scores_of(self, node: QueryNode, idfs: dict[str, float], docs: list[int], sim: str = "bm25"):
        """(owned matching docIDs, float64 scores) restricted to the GIVEN
        doc list — the second-pass scorer of ReRankQParserPlugin (a doc
        outside the rerank query's match set contributes nothing)."""
        d, s = self._eval(node, idfs, sim)
        if d.size == 0:
            return _EMPTY_I64, _EMPTY_F64
        req = np.asarray(sorted(docs), np.int64)
        pos = np.clip(np.searchsorted(d, req), 0, d.size - 1)
        ok = d[pos] == req
        return req[ok], s[pos[ok]]

    @staticmethod
    def _strict_after_mask(cols: dict, spec: list, docs: np.ndarray, after: tuple) -> np.ndarray:
        """cursorMark on a field sort: rows STRICTLY after `after`
        (= (v0, v1, ..., last_doc)) in the compound order — lexicographic
        walk with missing-last semantics on every key, docID asc tiebreak."""
        import pandas as pd

        n = docs.size
        after_m = np.zeros(n, bool)
        eq = np.ones(n, bool)
        for i, (_f, asc) in enumerate(spec):
            v = pd.Series(cols[f"s{i}"])
            a = after[i]
            vna = v.isna().to_numpy()
            if a is None or (isinstance(a, float) and np.isnan(a)):
                gt = np.zeros(n, bool)  # nothing sorts after a missing key (na last)
                eqi = vna
            else:
                cmp = (v > a) if asc else (v < a)
                gt = np.where(vna, True, cmp.fillna(False).to_numpy(dtype=bool))
                eqi = np.where(vna, False, (v == a).fillna(False).to_numpy(dtype=bool))
            after_m |= eq & gt
            eq &= eqi
        after_m |= eq & (docs > int(after[-1]))
        return after_m

    def top_k_sorted(
        self, node: QueryNode, idfs: dict[str, float], spec: list, k: int, after: tuple | None = None
    ):
        """Per-shard top-k of the match set ordered by a COMPOUND sort spec
        (the Solr `sort=f1 asc, f2 desc` path — TopFieldCollector over a
        SortField list).  Each (field, asc) entry resolves, in order, to a
        numeric doc-values column, a STRING doc-values column
        (SortedDocValues ordinal sort — we ship the bounded k values
        instead of ordinals, the cross-segment merge-by-value analog), or
        a function expression.  Ties break by docID asc; missing values
        sort LAST on either direction (sortMissingLast=true, applied
        identically at the driver merge).  → pandas frame of at most k
        rows (s0..sN sort columns + doc), or None on an empty match set."""
        import pandas as pd

        docs, _ = self._eval(node, idfs, "bm25")
        if docs.size == 0:
            return None
        cols = {}
        for i, (field, _asc) in enumerate(spec):
            if field.isidentifier():
                ndv = self._load_numeric_dv(field)
                if ndv is not None:
                    fd, fv = ndv
                    vals = fv[np.searchsorted(fd, docs)]
                else:
                    sdv = self._load_docvalues(field)
                    if sdv is None:
                        raise KeyError(f"unknown sort field {field!r}")
                    fd, fv = sdv
                    vals = fv[np.searchsorted(fd, docs)]
            else:
                from ..functions.scalar import evaluate, parse_expr

                expr, ecols = self._expr_columns(parse_expr(field), docs)
                vals = np.broadcast_to(
                    np.asarray(evaluate(expr, ecols), np.float64), docs.shape
                ).astype(np.float64)
            cols[f"s{i}"] = vals
        if after is not None:
            m = self._strict_after_mask(cols, spec, docs, after)
            if not m.any():
                return None
            docs = docs[m]
            cols = {c: v[m] for c, v in cols.items()}
        df = pd.DataFrame(cols)
        df["doc"] = docs
        return df.sort_values(
            [f"s{i}" for i in range(len(spec))] + ["doc"],
            ascending=[asc for _, asc in spec] + [True],
            kind="mergesort",
            na_position="last",
        ).head(k)

    def numeric_dv_of(self, fields: list[str], docs: list[int]) -> dict:
        """{field: (owned docIDs, float64 values)} for the docs THIS actor
        owns — the gather half of feature logging (each actor answers for
        its doc ranges only)."""
        d = np.asarray(docs, np.int64)
        out: dict = {}
        for f in fields:
            dv = self._load_numeric_dv(f)
            if dv is None:
                continue
            fd, fv = dv
            pos = np.clip(np.searchsorted(fd, d), 0, max(fd.size - 1, 0))
            ok = (fd[pos] == d) if fd.size else np.zeros(d.size, bool)
            out[f] = (d[ok], fv[pos[ok]])
        return out

    def _range_matching_terms(self, field: str, lo: str, hi: str):
        terms, dfs = self._term_dict()
        i = int(np.searchsorted(terms, f"{field}:{lo}"))
        j = int(np.searchsorted(terms, f"{field}:{hi}", side="right"))
        return terms[i:j], dfs[i:j]

    def _range_docs_index(self, field: str, lo: str, hi: str) -> np.ndarray:
        m_terms, _ = self._range_matching_terms(field, lo, hi)
        parts = [p[0] for t in m_terms if (p := self._postings(str(t))) is not None]
        if not parts:
            return _EMPTY_I64
        return np.unique(np.concatenate(parts))

    def _range_docs_scan(self, field: str, lo: str, hi: str) -> np.ndarray:
        dv = self._load_docvalues(field)
        if dv is None:
            return _EMPTY_I64
        doc_ids, vals = dv
        import pandas as pd

        valid = pd.notna(vals)  # docs without the field never match
        sv = vals[valid].astype("U")
        m = (sv >= lo) & (sv <= hi)
        docs = doc_ids[valid][m].astype(np.int64)
        live = self._live_mask(docs)
        return docs if live is None else docs[live]

    def _eval_term_range(self, node: QueryNode):
        """Constant-score TermRangeQuery with the cost-based plan choice;
        the chosen plan is recorded in `last_range_plan` for inspection."""
        field, lo, hi = node.pattern, node.terms[0], node.terms[1]
        _, m_dfs = self._range_matching_terms(field, lo, hi)
        cost_index = int(m_dfs.sum())
        fd, _ = self._load_docmap()
        n_docs = int(fd.size)
        dv_available = self._load_docvalues(field) is not None
        use_index = (not dv_available) or cost_index * self.RANGE_SCAN_FRACTION <= n_docs
        self.last_range_plan = {
            "field": field,
            "cost_index": cost_index,
            "n_docs": n_docs,
            "plan": "index" if use_index else "docvalues",
        }
        docs = (
            self._range_docs_index(field, lo, hi)
            if use_index
            else self._range_docs_scan(field, lo, hi)
        )
        return docs, np.ones(docs.size, dtype=np.float64)

    def _load_docmap(self):
        if getattr(self, "_docmap", None) is None:
            import pyarrow as pa

            tables = [
                pq.read_table(p, columns=["doc_id", "conv_id"]) for p in self._docmap_paths
            ]
            t = pa.concat_tables(tables).sort_by("doc_id")
            self._docmap = (
                t.column("doc_id").to_numpy(),
                t.column("conv_id").to_numpy(zero_copy_only=False),
            )
        return self._docmap

    def match_parents(
        self,
        node: QueryNode,
        idfs: dict[str, float],
        score_mode: str = "max",
        sim: str = "bm25",
        dead: np.ndarray | None = None,
    ):
        """ToParentBlockJoin aggregation SHARD-LOCAL: evaluate children,
        mask tombstones, aggregate per conv (float64 accumulation in doc
        order — identical to a sequential driver sum) and return only the
        (conv_id, parent_score32) pairs.  The driver merges parent tuples,
        never child hits."""
        docs, scores = self._eval(node, idfs, sim)
        if dead is not None and dead.size and docs.size:
            live = ~np.isin(docs, dead)
            docs, scores = docs[live], scores[live]
        if docs.size == 0:
            return np.empty(0, dtype=object), np.empty(0, dtype=np.float32)
        fd, fc = self._load_docmap()
        order = np.argsort(docs, kind="stable")
        docs, scores = docs[order], scores[order]
        convs = fc[np.searchsorted(fd, docs)]
        s64 = scores.astype(np.float32).astype(np.float64)
        new = np.empty(convs.size, dtype=bool)
        new[0] = True
        new[1:] = convs[1:] != convs[:-1]
        starts = np.flatnonzero(new)
        if score_mode == "max":
            agg = np.maximum.reduceat(s64, starts)
        elif score_mode == "total":
            agg = np.add.reduceat(s64, starts)
        else:
            lens = np.diff(np.append(starts, convs.size))
            agg = np.add.reduceat(s64, starts) / lens
        return convs[starts], agg.astype(np.float32)

    def match_parents_childfield(
        self,
        node: QueryNode,
        idfs: dict[str, float],
        field: str,
        sel: str = "max",
        sim: str = "bm25",
    ):
        """ToParentBlockJoinSortField (lucene/join/.../BlockJoinSelector
        .java Type_min/Type_max): the parent's sort value is min|max of its
        MATCHING children's numeric doc-values, aggregated shard-locally
        per conv block — only (conv_id, value) pairs cross the wire
        (childfield(f, $q) in Solr sort syntax)."""
        docs, _ = self._eval(node, idfs, sim)
        empty = (np.empty(0, dtype=object), np.empty(0, np.float64))
        if docs.size == 0:
            return empty
        ndv = self._load_numeric_dv(field)
        if ndv is None:
            return empty
        dd, vv = ndv
        docs = np.sort(docs)
        pos = np.searchsorted(dd, docs)
        ok = (pos < dd.size) & (dd[np.minimum(pos, dd.size - 1)] == docs)
        docs = docs[ok]
        if docs.size == 0:
            return empty
        v = vv[pos[ok]]
        fd, fc = self._load_docmap()
        convs = fc[np.searchsorted(fd, docs)]
        new = np.empty(convs.size, dtype=bool)
        new[0] = True
        new[1:] = convs[1:] != convs[:-1]
        starts = np.flatnonzero(new)
        agg = (
            np.maximum.reduceat(v, starts) if sel == "max" else np.minimum.reduceat(v, starts)
        )
        return convs[starts], agg.astype(np.float64)

    def match_children(
        self,
        node: QueryNode,
        idfs: dict[str, float],
        score_mode: str = "max",
        sim: str = "bm25",
    ):
        """ToChildBlockJoinQuery analog (lucene/join/src/java/org/apache/
        lucene/search/join/ToChildBlockJoinQuery.java), SHARD-LOCAL: the
        parent query evaluates to (conv, parent_score) exactly as
        `match_parents`, then every LIVE child doc of a matching conv is
        emitted carrying its parent's score (the reference propagates the
        parent score to each child).  Conv blocks never span doc-range
        shards, so the join is local; the driver merges (doc, score32)."""
        pconvs, pscores = self.match_parents(node, idfs, score_mode, sim)
        if pconvs.size == 0:
            return _EMPTY_I64, np.empty(0, dtype=np.float32)
        fd, fc = self._load_docmap()
        docs = fd.astype(np.int64)
        # vectorized conv → parent-score gather: sort parents, searchsorted
        order = np.argsort(pconvs, kind="stable")
        sp, ss = pconvs[order], pscores[order]
        pos = np.minimum(np.searchsorted(sp, fc), sp.size - 1)
        hit = sp[pos] == fc
        docs, scores = docs[hit], ss[pos[hit]]
        live = self._live_mask(docs)
        if live is not None:
            docs, scores = docs[live], scores[live]
        return docs, scores.astype(np.float32)

    def children_of(self, convs: list, limit: int) -> dict:
        """First `limit` LIVE child docIDs per conv — the fetch half of the
        ChildDocTransformer (solr/core/src/java/org/apache/solr/response/
        transform/ChildDocTransformerFactory.java).  Conv blocks are
        shard-local, so exactly one shard answers for each conv; only
        k × limit ids ever cross the wire."""
        fd, fc = self._load_docmap()
        out = {}
        for c in convs:
            lo = int(np.searchsorted(fc, c, "left"))
            hi = int(np.searchsorted(fc, c, "right"))
            if lo == hi:
                continue
            docs = fd[lo:hi].astype(np.int64)
            live = self._live_mask(docs)
            if live is not None:
                docs = docs[live]
            if docs.size:
                out[c] = docs[:limit].tolist()
        return out

    def top_k(
        self,
        node: QueryNode,
        k: int,
        idfs: dict[str, float],
        prune: bool = True,
        sim: str = "bm25",
        after: tuple | None = None,
    ):
        """→ (doc_ids int64, scores float32), shard-local top-k.

        `after` = (score float32, doc_id) — IndexSearcher.searchAfter
        (lucene/core/.../search/IndexSearcher.java): only hits STRICTLY
        after the bound in (score desc, docID asc) rank order survive, so
        page N+1 never re-ships page N's hits from any shard."""
        cache_key = (repr(node), k, prune, sim, after)
        hit = self._result_cache.get(cache_key)
        if hit is not None:
            return hit
        result = self._top_k_uncached(node, k, idfs, prune, sim, after)
        self._result_cache.put(cache_key, result)
        return result

    def _top_k_uncached(
        self,
        node: QueryNode,
        k: int,
        idfs: dict[str, float],
        prune: bool,
        sim: str,
        after: tuple | None = None,
    ):
        # searchAfter disables the pruned paths: WAND's θ floor assumes the
        # page starts at rank 0 (Lucene routes searchAfter through a
        # PagingTopScoreDocCollector for the same reason)
        if after is not None:
            prune = False
        plan = self._prunable_plan(node) if (prune and sim == "bm25") else None
        if plan is not None:
            docs, scores = self._eval_bool_pruned(*plan, k, idfs)
        elif prune and sim == "bm25" and node.kind == "phrase" and node.boost == 1.0:
            docs, scores = self._eval_phrase_pruned(node, k, idfs)
        else:
            docs, scores = self._eval(node, idfs, sim)
        if after is not None and docs.size:
            a_s, a_d = np.float32(after[0]), int(after[1])
            s32 = scores.astype(np.float32)
            keep = (s32 < a_s) | ((s32 == a_s) & (docs > a_d))
            docs, scores = docs[keep], scores[keep]
        scores32 = scores.astype(np.float32)
        if docs.size > k:
            # kth-highest score is the tie boundary; keep every candidate at
            # or above it, then order exactly (score desc, docID asc)
            thresh = scores32[np.argpartition(-scores32, k - 1)[k - 1]]
            cand = np.flatnonzero(scores32 >= thresh)
            order = np.lexsort((docs[cand], -scores32[cand]))[:k]
            sel = cand[order]
            return docs[sel], scores32[sel]
        order = np.lexsort((docs, -scores32))
        return docs[order], scores32[order]

    def _prunable_plan(self, node: QueryNode):
        """WAND/block-max pruning applies when every SCORED clause is an
        unboosted term (WANDScorer.java preconditions, SURVEY.md §3.2);
        FILTER / MUST_NOT clauses may be arbitrary sub-queries — they only
        shape the candidate set and never contribute score bounds.
        → (must_terms, should_terms, filter_nodes, not_nodes) or None."""
        if node.kind != "bool" or node.boost != 1.0:
            return None
        musts: list[str] = []
        shoulds: list[str] = []
        filters: list[QueryNode] = []
        nots: list[QueryNode] = []
        for occ, c in node.clauses:
            if occ in ("MUST", "SHOULD"):
                if c.kind != "term" or c.boost != 1.0:
                    return None
                (musts if occ == "MUST" else shoulds).append(c.terms[0])
            elif occ == "FILTER":
                filters.append(c)
            else:
                nots.append(c)
        if not musts and not shoulds:
            return None  # pure-filter query: nothing to bound
        # should-COUNT constraints need per-doc tallies → exhaustive path
        # (union candidates already guarantee ≥1 should when no must)
        if node.min_should_match > (0 if musts else 1):
            return None
        return musts, shoulds, filters, nots

    def _eval_bool_pruned(self, musts, shoulds, filters, nots, k: int, idfs: dict[str, float]):
        """Vectorized block-max pruning for term-scored boolean queries.

        1. Candidates: ∩ MUST doc lists (∪ SHOULD lists when no MUST),
           then ∩ FILTER matches and ∖ MUST_NOT matches.  2. Per-doc upper
        bound = Σ over scored terms of the block_upper_bound of the block
        holding the doc (0 if absent).  3. Exact-score the k best-bounded
        docs → floor θ.  4. Docs with bound < θ cannot enter the top-k →
        drop; exact-score the survivors only.  Result-identical to
        exhaustive evaluation (upper bounds are sound, θ is float32-safe).
        """
        metas, posts, live_terms = [], [], []
        must_docs: list[np.ndarray] = []
        for t in musts:
            p = self._postings(t)
            if p is None:
                return _EMPTY_I64, _EMPTY_F64  # missing MUST term → no match
            must_docs.append(p[0])
        for t in musts + shoulds:
            m = self._block_meta(t)
            p = self._postings(t)
            if m is None or p is None:
                continue  # only reachable for missing SHOULD terms
            metas.append(m)
            posts.append((p[0], p[1], p[2]))  # cache may hold the 5-tuple w/ positions
            live_terms.append(t)
        if not posts:
            return _EMPTY_I64, _EMPTY_F64
        if must_docs:
            docs = None  # cost-ordered: smallest list leads (ConjunctionDISI)
            for d2 in sorted(must_docs, key=lambda d: d.size):
                docs = d2 if docs is None else np.intersect1d(docs, d2, assume_unique=True)
                if docs.size == 0:
                    return _EMPTY_I64, _EMPTY_F64
        else:
            docs = np.unique(np.concatenate([p[0] for p in posts]))
        for f in filters:
            fd, _ = self._eval(f, idfs, "bm25")
            docs = np.intersect1d(docs, fd, assume_unique=True)
            if docs.size == 0:
                return _EMPTY_I64, _EMPTY_F64
        for nnode in nots:
            nd, _ = self._eval(nnode, idfs, "bm25")
            if nd.size and docs.size:
                docs = docs[~np.isin(docs, nd, assume_unique=True)]
        if docs.size == 0:
            return _EMPTY_I64, _EMPTY_F64
        bounds = np.zeros(docs.size, dtype=np.float64)
        for t, (last, maxf, minn), (pdocs, _, _) in zip(live_terms, metas, posts):
            ub = block_upper_bound(maxf, minn, idfs.get(t, 0.0), self._cache_for(t))
            blk = np.searchsorted(last, docs)  # block whose range covers doc
            mic = np.clip(np.searchsorted(pdocs, docs), 0, pdocs.size - 1)
            sel = (pdocs[mic] == docs) & (blk < last.size)
            add = np.zeros(docs.size, dtype=np.float64)
            add[sel] = ub[blk[sel]]
            bounds += add
        if docs.size <= k:
            return self._exact_scores(docs, live_terms, posts, idfs)
        # floor θ from the k best-bounded docs
        top_idx = np.argpartition(-bounds, k - 1)[:k]
        seed_docs = np.sort(docs[top_idx])
        _, seed_scores = self._exact_scores(seed_docs, live_terms, posts, idfs)
        if seed_scores.size >= k:
            # final ranking ties are decided at float32: θ must not prune a
            # doc whose exact score rounds to the same float32 as the kth
            # seed (it could win the docID tie-break) — use the float32
            # predecessor of the kth float32 seed score as the floor
            s32 = seed_scores.astype(np.float32)
            kth32 = np.partition(s32, s32.size - k)[s32.size - k]
            theta = float(np.nextafter(kth32, np.float32(-np.inf)))
        else:
            theta = 0.0
        keep = bounds >= theta
        survivors = docs[keep]
        self._prune_candidates += int(docs.size)
        self._prune_survivors += int(survivors.size) + int(seed_docs.size)
        return self._exact_scores(survivors, live_terms, posts, idfs)

    def _exact_scores(self, docs: np.ndarray, terms: list[str], posts, idfs: dict[str, float]):
        scores = np.zeros(docs.size, dtype=np.float64)
        for t, (pdocs, pfreqs, pnorms) in zip(terms, posts):
            idx = np.searchsorted(pdocs, docs)
            mic = np.clip(idx, 0, max(pdocs.size - 1, 0))
            hit = pdocs[mic] == docs if pdocs.size else np.zeros(docs.size, bool)
            s = score_postings(pfreqs[mic[hit]], pnorms[mic[hit]], idfs.get(t, 0.0), self._cache_for(t))
            scores[hit] += s
        return docs, scores

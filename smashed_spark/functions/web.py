"""URL/domain curation operators: host extraction, registered-domain
approximation, and domain allow/block filtering — the web-corpus
hygiene steps (C4/RefinedWeb drop blocklisted domains; per-domain
caps fight template farms).  The reference has no web surface
(additive, SURVEY.md §2.10).

Everything here is pure Column algebra (regexp on the JVM side — URL
parsing never needs Python), so extraction rides the scan with zero
exchanges.  Filtering has two tiers:

* small lists (``<= max_literal_terms``): an ``isin`` plan literal —
  Catalyst folds it into the scan's pushed filters, zero joins;
* DataFrame blocklists of any size: a ``broadcast()`` LEFT ANTI /
  LEFT SEMI join on the domain — domain vocabularies are millions of
  rows at web scale (MBs), far under the broadcast threshold, and
  the corpus side never exchanges.

Registered-domain extraction defaults to an APPROXIMATION: the real
rule needs the Mozilla public-suffix list (thousands of entries,
updated continuously); the default keeps the last two labels, plus
the last three under a small built-in set of common second-level
public suffixes (``co.uk``, ``com.au``, ...).  Deployments that need
real PSL semantics pass their own snapshot via
``UrlHostMapper(suffixes=...)`` — a sequence or one-column DataFrame
of plain suffix entries, compiled into per-depth in-plan literals
(bounded dimension metadata; wildcard/exception rules refused).

Per-domain caps are deliberately NOT re-implemented here: compose
``UrlHostMapper`` with the existing quota sampler
(:func:`~smashed_spark.sources.loaders.quota_sample` — WindowGroupLimit,
no full sort) on the extracted domain column.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.mapper import SparkMapper

__all__ = [
    "UrlHostMapper",
    "DomainFilterMapper",
    "UrlCanonicalMapper",
    "tracking_drop_regex",
]

# applied AFTER the scheme prefix is stripped (a one-regex version
# backtracks "http://" into host "http"):  [user@]  host  [:port][/...]
_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://"
_HOST_RE = r"^(?:[^/@?#\s]*@)?([^/:?#\s]+)"

# common second-level public suffixes where the registered domain is
# three labels (approximate, documented subset — not the full PSL)
_SECOND_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
)


class UrlHostMapper(SparkMapper):
    """Extract the lowercase host and an approximate registered
    domain from a URL column.  Scheme-less inputs (``example.com/x``)
    parse too; a leading ``www.`` is stripped from the host before
    the registered-domain cut.  Unparseable/NULL URLs yield NULL in
    both fields.  Pure regexp Column algebra — narrow, zero shuffle.

    ``suffixes=`` replaces the built-in 16-entry second-level suffix
    approximation with YOUR public-suffix snapshot: a sequence of
    plain suffix strings or a one-column DataFrame (e.g. a parquet of
    the Mozilla PSL).  Entries may be any label depth (``uk``,
    ``co.uk``, ``pref.hokkaido.jp``); the registered domain is the
    deepest matching suffix plus one more label.  PSL wildcard
    (``*.ck``) and exception (``!www.ck``) rules are NOT supported
    and raise.  The list is dimension METADATA — bounded
    (``max_suffix_entries``, the real PSL is ~10k rows) and collected
    to the driver once, then compiled into per-depth ``isin`` plan
    literals, so the cut still rides the scan with zero joins and
    zero exchanges at any corpus size.
    """

    def __init__(
        self,
        url_field: str = "url",
        host_field: str = "host",
        domain_field: str = "domain",
        suffixes: Union[Sequence[str], DataFrame, None] = None,
        max_suffix_entries: int = 100_000,
    ) -> None:
        self.url_field = url_field
        self.host_field = host_field
        self.domain_field = domain_field
        self.suffixes = suffixes
        self.max_suffix_entries = max_suffix_entries
        super().__init__(
            input_fields=[url_field],
            output_fields=[host_field, domain_field],
        )

    def _suffix_sets(self):
        """Resolve ``suffixes`` to {label_depth: sorted entries}.
        Depth-1 entries (plain TLDs) are accepted but dropped: the
        default last-two-labels cut already implements them."""
        terms = self.suffixes
        if isinstance(terms, str):
            # a bare string would iterate as CHARACTERS: every entry
            # depth-1, silently discarding both the custom set and the
            # built-in one — reject loudly instead
            raise ValueError(
                f"suffixes= got a bare string {terms!r} — pass a "
                "list/tuple of suffix strings or a one-column "
                "DataFrame"
            )
        if terms is None:
            entries = list(_SECOND_LEVEL_SUFFIXES)
        elif isinstance(terms, DataFrame):
            if len(terms.columns) != 1:
                raise ValueError(
                    "suffixes DataFrame must have exactly one column, "
                    f"got {terms.columns}"
                )
            rows = terms.limit(self.max_suffix_entries + 1).collect()
            if len(rows) > self.max_suffix_entries:
                raise ValueError(
                    f"suffixes DataFrame exceeds max_suffix_entries="
                    f"{self.max_suffix_entries} — a public-suffix "
                    "snapshot is bounded metadata, not corpus data"
                )
            entries = [r[0] for r in rows]
        else:
            entries = list(terms)
            if len(entries) > self.max_suffix_entries:
                raise ValueError(
                    f"suffixes list exceeds max_suffix_entries="
                    f"{self.max_suffix_entries}"
                )
        sets: dict = {}
        for e in entries:
            if e is None:
                continue
            s = str(e).strip().lower()
            if (
                not s
                or "*" in s
                or "!" in s
                or s.startswith(".")
                or s.endswith(".")
            ):
                raise ValueError(
                    f"suffixes entry {e!r} is not a plain suffix — "
                    "PSL wildcard (*.tld) and exception (!host) rules "
                    "are not supported; expand them upstream"
                )
            depth = s.count(".") + 1
            if depth >= 2:
                sets.setdefault(depth, set()).add(s)
        if not sets and self.suffixes is not None:
            # only depth-1 entries: legal, the default cut covers them
            return {}
        return {d: sorted(v) for d, v in sets.items()}

    def apply(self, df: DataFrame) -> DataFrame:
        url = F.trim(F.col(self.url_field))
        raw = F.lower(
            F.regexp_extract(F.regexp_replace(url, _SCHEME_RE, ""), _HOST_RE, 1)
        )
        # plausibility gate: free text like "not a url" also "matches"
        # the scheme-less pattern with its first word — accept only a
        # host that came with an explicit scheme, contains a dot, or
        # is localhost (hostname-shaped chars throughout)
        has_scheme = url.rlike(_SCHEME_RE)
        plausible = raw.rlike(r"^[a-z0-9.\-]+$") & (
            has_scheme | raw.contains(".") | (raw == "localhost")
        )
        host = F.when((raw != "") & plausible, raw)
        bare = F.regexp_replace(host, r"^www\.", "")
        parts = F.split(bare, r"\.")
        n = F.size(parts)

        def last_k(k: int):
            # concat_ws skips the NULLs element_at yields past the
            # array start, so a host with exactly k labels compares
            # equal to itself here — matching the n<=2 bare behavior
            return F.concat_ws(
                ".",
                *[F.element_at(parts, -i) for i in range(k, 0, -1)],
            )

        last2 = last_k(2)
        # resolve ONCE (a DataFrame suffixes= collects here), then
        # deepest suffix first: "pref.hokkaido.jp" must win over "jp"
        suffix_sets = self._suffix_sets()
        domain = F.when(n <= 2, bare)
        for depth in sorted(suffix_sets, reverse=True):
            domain = domain.when(
                last_k(depth).isin(*suffix_sets[depth]),
                last_k(depth + 1),
            )
        domain = domain.otherwise(last2)
        return df.withColumns(
            {
                self.host_field: host,
                self.domain_field: F.when(host.isNotNull(), domain),
            }
        )


class DomainFilterMapper(SparkMapper):
    """Drop (blocklist) or keep (allowlist) rows by domain.

    ``terms`` may be a Python sequence or a one-column DataFrame.
    Sequences up to ``max_literal_terms`` compile to an ``isin`` plan
    literal (folds into the scan's pushed filters); longer sequences
    and every DataFrame go through a ``broadcast()`` LEFT ANTI
    (blocklist) / LEFT SEMI (allowlist) join — the corpus side never
    exchanges either way.  Matching is on the exact domain string
    lowercased; NULL domains are DROPPED in allowlist mode and KEPT
    in blocklist mode (a missing domain is not on any blocklist).
    """

    def __init__(
        self,
        domain_field: str = "domain",
        blocklist: Union[Sequence[str], DataFrame, None] = None,
        allowlist: Union[Sequence[str], DataFrame, None] = None,
        max_literal_terms: int = 1000,
    ) -> None:
        if (blocklist is None) == (allowlist is None):
            raise ValueError(
                "provide exactly one of blocklist= or allowlist="
            )
        self.domain_field = domain_field
        self.mode = "block" if blocklist is not None else "allow"
        self._terms = blocklist if blocklist is not None else allowlist
        self.max_literal_terms = max_literal_terms
        super().__init__(input_fields=[domain_field])

    def config(self) -> dict:
        terms = self._terms
        return {
            "domain_field": self.domain_field,
            "mode": self.mode,
            "max_literal_terms": self.max_literal_terms,
            "terms": (
                sorted(str(t).lower() for t in terms)
                if not isinstance(terms, DataFrame)
                else f"dataframe:{terms.columns}"
            ),
        }

    def apply(self, df: DataFrame) -> DataFrame:
        dom = F.lower(F.col(self.domain_field))
        terms = self._terms
        if isinstance(terms, DataFrame):
            if len(terms.columns) != 1:
                raise ValueError(
                    f"terms DataFrame must have exactly one column, "
                    f"got {terms.columns}"
                )
            tdf = terms.select(
                F.lower(F.col(terms.columns[0]))
                .alias(self.domain_field)
            )
        else:
            vals = sorted({str(t).lower() for t in terms})
            if not vals:
                # empty blocklist keeps everything; empty allowlist
                # keeps nothing — both are almost certainly config
                # mistakes at corpus scale
                raise ValueError(f"empty {self.mode}list")
            if len(vals) <= self.max_literal_terms:
                if self.mode == "block":
                    return df.filter(~dom.isin(vals) | dom.isNull())
                return df.filter(dom.isin(vals))
            tdf = df.sparkSession.createDataFrame(
                [(v,) for v in vals], f"{self.domain_field} string"
            )
        # NULL keys never match a join: LEFT ANTI keeps NULL-domain
        # rows, LEFT SEMI drops them — exactly the documented
        # block/allow semantics, no extra predicate needed
        how = "left_anti" if self.mode == "block" else "left_semi"
        return (
            df.withColumn("__dom__", dom)
            .join(
                F.broadcast(
                    tdf.withColumnRenamed(self.domain_field, "__dom__")
                ),
                on="__dom__",
                how=how,
            )
            .drop("__dom__")
        )


# tracking query parameters dropped by UrlCanonicalMapper's default
# config — the common cross-site click/campaign identifiers; callers
# with site-specific noise pass their own list
_TRACKING_PARAMS = (
    "fbclid", "gclid", "msclkid", "dclid", "mc_eid", "mc_cid",
    "igshid", "ref_src", "ref_url", "spm", "yclid",
)


def tracking_drop_regex(params: Sequence[str]) -> str:
    """The tracking-parameter drop pattern — ``utm_*`` plus the given
    exact names — built in ONE place so the mapper, the pii_redact
    gate oracle, and the unit replay can never drift (``re.escape``
    emits identical escaping for Java regex and RE2 over the
    characters parameter names can contain)."""
    import re as _re

    return "|".join(["utm_[^=&]*"] + [_re.escape(t) for t in params])


class UrlCanonicalMapper(SparkMapper):
    """Canonicalize a URL column so byte-unequal duplicates of the
    same resource collapse for exact dedup / per-URL grouping — the
    step BEFORE ``md5(url)`` keys mean anything at web scale (the
    same page arrives as ``HTTP://Site.com/a/?utm_source=x#top`` and
    ``http://site.com/a`` across crawls).

    Rules, in order (each a documented normalization, applied with
    pure JVM ``regexp``/array algebra — zero Python, zero exchanges,
    and every expression has a DuckDB twin so oracles replay it):

    1. trim surrounding whitespace; strip the ``#fragment``;
    2. lowercase the scheme and the host[:port] — never path,
       query, or RFC-3986 case-sensitive userinfo (``User@`` is kept);
    3. drop the scheme-default port (``:80`` http, ``:443`` https);
    4. drop tracking query parameters: exact names from
       ``tracking_params`` plus every ``utm_*``;
    5. byte-order-sort the surviving ``k=v`` parameters (param order
       is transport noise; byte order is collation-free on both
       engines for ASCII params) and drop an emptied query entirely;
    6. strip trailing ``/`` runs from the path (root ``/`` becomes
       empty — ``http://a.com/`` == ``http://a.com``).

    Values WITHOUT a ``scheme://`` are passed through steps 1-2's
    trim/fragment-strip only and otherwise left verbatim (not URLs —
    a hygiene mapper must not invent structure); NULL stays NULL.
    """

    def __init__(
        self,
        url_field: str = "url",
        output_field: str = "canon_url",
        tracking_params: Sequence[str] = _TRACKING_PARAMS,
    ) -> None:
        self.url_field = url_field
        self.output_field = output_field
        bad = [t for t in tracking_params if not t or "=" in t or "&" in t]
        if bad:
            raise ValueError(
                f"tracking_params must be bare parameter names: {bad}"
            )
        self.tracking_params = tuple(tracking_params)
        super().__init__(
            input_fields=[url_field], output_fields=[output_field]
        )

    def apply(self, df: DataFrame) -> DataFrame:
        u0 = F.trim(F.col(self.url_field))
        # re-trim after the fragment strip: 'text #frag' must not keep
        # its now-trailing space on the non-URL passthrough path
        u1 = F.trim(F.regexp_replace(u0, r"#.*", ""))
        scheme = F.lower(
            F.regexp_extract(u1, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
        )
        after = F.regexp_replace(u1, _SCHEME_RE, "")
        authority = F.regexp_extract(after, r"^([^/?]*)", 1)
        # lowercase ONLY host[:port] — RFC 3986 userinfo (user:pass@)
        # is case-sensitive, and merging 'UserA@' with 'usera@' would
        # conflate genuinely different resources
        userinfo = F.regexp_extract(authority, r"^([^@]*@)", 1)
        hostport = F.concat(
            userinfo,
            F.lower(F.regexp_replace(authority, r"^[^@]*@", "")),
        )
        host = (
            F.when(
                (scheme == "http") & hostport.endswith(":80"),
                hostport.substr(F.lit(1), F.length(hostport) - 3),
            )
            .when(
                (scheme == "https") & hostport.endswith(":443"),
                hostport.substr(F.lit(1), F.length(hostport) - 4),
            )
            .otherwise(hostport)
        )
        # everything after the authority — '' or starts with '/' or '?'
        pathq = after.substr(
            F.length(authority) + 1, F.length(after)
        )
        path = F.regexp_extract(pathq, r"^([^?]*)", 1)
        query = F.when(
            pathq.contains("?"),
            F.regexp_replace(pathq, r"^[^?]*\?", ""),
        ).otherwise(F.lit(""))
        drop_re = tracking_drop_regex(self.tracking_params)
        params = F.filter(
            F.split(query, "&"),
            lambda x: (x != "") & ~x.rlike(f"^(?:{drop_re})(?:=.*)?$"),
        )
        canon_q = F.array_join(F.array_sort(params), "&")
        path_norm = F.regexp_replace(path, r"/+$", "")
        canon = F.concat(
            scheme,
            F.lit("://"),
            host,
            path_norm,
            F.when(
                canon_q != "", F.concat(F.lit("?"), canon_q)
            ).otherwise(F.lit("")),
        )
        return df.withColumn(
            self.output_field,
            F.when(scheme == "", u1).otherwise(canon),
        )

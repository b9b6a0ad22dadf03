"""Catalog-as-commit-point: make an external Iceberg catalog row the
authoritative pointer for a published table (``publish_mode=per_commit``).

The reference's tables are created and committed *through* a catalog —
JDBC / Nessie / REST (IcebergChangeConsumer.java:100-102,
testresources/CatalogJdbc.java:29-41): the catalog row IS the table, and
every commit is a catalog CAS.  The engine's cadence publication
(``publish_every_commits``) approximates that — the catalog lags the
filesystem HEAD by at most N commits, a dual-source-of-truth window.
This module eliminates the window: a :class:`CatalogCommitHook` attached
to ``LakeTable.commit_hook`` runs INSIDE every commit, between writing
the candidate metadata file and swinging the local version-hint:

1. export the CANDIDATE state as a real Iceberg metadata file
   (``export_iceberg_table(metadata=candidate)`` — incremental,
   metadata-only; the candidate's manifest is already on disk);
2. CAS the catalog pointer from the location THIS hook last published
   to the new export (JDBC: one ``UPDATE ... WHERE metadata_location =
   expected``; REST: the spec's CommitTable requirements document);
3. only if the CAS lands does the engine's commit reach its local
   atomic point.

A CAS failure — a concurrent writer owns the catalog row —
:class:`CommitFailedError` propagates and the engine's commit does NOT
advance (the candidate metadata file is removed by the commit path), so
the catalog row is genuinely authoritative: no engine state ever exists
that the catalog does not point to.  Crash window: a crash between the
catalog CAS and the hint replace leaves the catalog one export AHEAD of
the filesystem hint; the replayed commit re-exports and CASes forward
from the catalog's then-current pointer (``expected=None`` on the first
commit after construction), converging — external readers resolved
through the catalog never saw an incomplete table at any point.

Foreign-writer detection is BETWEEN consecutive commits of one hook
instance: the first commit after construction CASes from the catalog's
current pointer (load-then-CAS — the same semantics the cadence path's
``register_table(overwrite=True)`` has), every later commit CASes from
the location this instance last published, so any interleaved foreign
move fails the CAS loudly.
"""

from __future__ import annotations

import os


class CatalogCommitHook:
    """``LakeTable.commit_hook`` implementation: export + catalog CAS
    per engine commit.

    ``client`` is a :class:`..jdbc_catalog.JdbcCatalogClient` or
    :class:`..rest_catalog.RestCatalogClient` — anything with
    ``create_namespace(ns, exist_ok=)``, ``register_table(ns, name,
    loc, overwrite=)``, ``commit_table(ns, name, new, expected)`` and
    ``load_table(ns, name)``; conflicts must raise the module's
    CommitFailedError equivalent (they propagate verbatim)."""

    def __init__(
        self,
        client,
        namespace: str,
        table_name: str,
        dest: str,
        degrade_partitions: bool = False,
    ) -> None:
        self.client = client
        self.namespace = namespace
        self.table_name = table_name
        self.dest = dest
        self.degrade_partitions = degrade_partitions
        #: metadata location this hook last CASed in — None until the
        #: first commit, which CASes from the catalog's current pointer
        #: (or INSERTs when the table is not registered yet)
        self.last_published: str | None = None

    def __call__(self, table, candidate_meta, new_version: int) -> None:
        from .iceberg_export import export_iceberg_table

        md_path = export_iceberg_table(
            table,
            self.dest,
            degrade_partitions=self.degrade_partitions,
            metadata=candidate_meta,
        )
        self.client.create_namespace(self.namespace, exist_ok=True)
        if self.last_published is None:
            # first commit through this hook: register or CAS from the
            # catalog's current pointer (the cadence path's overwrite
            # semantics) — thereafter every commit CASes from our own
            # last publication, so foreign moves fail loudly
            out = self.client.register_table(
                self.namespace, self.table_name, md_path, overwrite=True
            )
        else:
            out = self.client.commit_table(
                self.namespace, self.table_name, md_path, self.last_published
            )
        self.last_published = out.get("metadata-location", md_path)


def attach_catalog_commit_hook(
    table,
    client,
    namespace: str,
    table_name: str,
    publish_root: str,
) -> CatalogCommitHook:
    """Wire a :class:`CatalogCommitHook` onto ``table`` (idempotent:
    re-attaching with the same identity keeps the existing hook and its
    ``last_published`` tracking).  ``publish_root`` is the export root;
    the table name is appended, matching the cadence path's layout."""
    hook = getattr(table, "commit_hook", None)
    if (
        isinstance(hook, CatalogCommitHook)
        and hook.namespace == namespace
        and hook.table_name == table_name
    ):
        return hook
    hook = CatalogCommitHook(
        client, namespace, table_name, os.path.join(publish_root, table_name)
    )
    table.commit_hook = hook
    return hook

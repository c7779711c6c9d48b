"""The reference's user-facing API: ``store_*`` functions (SURVEY.md §2 Part A).

Every function follows the reference's one template (⟨pub⟩ every
R/store_*.R [H], SURVEY.md §3.1): **validate → normalize → fingerprint →
stage → server-side merge → return input + fingerprints**. Here the merge
runs through ``sources/jdbc.py`` (staging table + set-based SQL, exactly the
reference's design) against any backend — DuckDB in tests, a JDBC-reachable
warehouse on a cluster.

A user of ``n2kupdate`` maps 1:1:

    n2kupdate (R)                      n2kupdate_spark (PySpark)
    ---------------------------------  ----------------------------------
    conn <- connect_ut_db()            store = N2kStore(backend)
    store_language(lang_df, conn)      store.store_language(lang_df)
    store_scheme(df, hash, conn)       store.store_scheme(df)
    store_species_group_species(...)   store.store_species_group_species(...)

Validation mirrors the reference's assertthat guards: required columns
present, no NULL in natural-key columns, junk columns rejected — errors
raised *before* any write (all-or-nothing batch semantics come from the
transactional merge in sources/jdbc.py).

Scale notes: fingerprints are computed executor-side as Spark columns
(md5 of '|'-joined natural keys — SURVEY.md §7.4.1: sha1 kept as an opt-in
because the DuckDB oracle lacks it); staging writes go executor→database in
parallel; the merge is one set-based statement on the server. Nothing here
collects a fact table to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from n2kupdate_spark.functions import fingerprint
from n2kupdate_spark.sources.jdbc import upsert


class ValidationError(ValueError):
    """Junk input rejected before touching the database (reference:
    assertthat errors)."""


@dataclass(frozen=True)
class TableSpec:
    """One target table: natural key, attributes, merge mode."""

    name: str
    natural_key: Sequence[str]
    attributes: Sequence[str] = ()
    mode: str = "scd1"  # scd1 | insert_ignore | set_replace
    group_key: Sequence[str] = ()  # set_replace only: the replaced scope

    @property
    def columns(self) -> list[str]:
        return [*self.natural_key, *self.attributes]


#: The n2kresult target tables the reference stores into (SURVEY.md §2
#: Part A [M] — names reconstructed; semantics per store-function row).
TABLE_SPECS: dict[str, TableSpec] = {
    "language": TableSpec("language", ("code",), ("description",)),
    "datasource_type": TableSpec("datasource_type", ("description",)),
    "datafield_type": TableSpec("datafield_type", ("description",)),
    "scheme": TableSpec("scheme", ("description",)),
    "anomaly_type": TableSpec("anomaly_type", ("description",)),
    "model_set": TableSpec("model_set", ("description",), ("first_year", "last_year", "duration")),
    "datasource": TableSpec("datasource", ("description", "datasource_type"), ()),
    "species_group": TableSpec("species_group", ("description", "scheme"), ()),
    "location_group": TableSpec("location_group", ("description", "scheme"), ()),
    "species_group_species": TableSpec(
        "species_group_species",
        ("species_group", "species"),
        (),
        mode="set_replace",
        group_key=("species_group",),
    ),
    "location_group_location": TableSpec(
        "location_group_location",
        ("location_group", "location"),
        (),
        mode="set_replace",
        group_key=("location_group",),
    ),
    "analysis": TableSpec(
        "analysis",
        ("file_fingerprint",),
        ("model_set", "first_year", "last_year", "duration"),
        mode="insert_ignore",
    ),
    "analysis_version": TableSpec(
        "analysis_version", ("analysis", "version_fingerprint"), (), mode="insert_ignore"
    ),
    # parent_parameter is an attribute, not key material: NULL for root
    # parameters, and the no-NA natural-key guard must not reject roots.
    "datasource_parameter": TableSpec(
        "datasource_parameter", ("description",), ("parent_parameter",)
    ),
    "datasource_value": TableSpec(
        "datasource_value", ("datasource", "parameter"), ("value",)
    ),
    "species": TableSpec(
        "species", ("scientific_name",), ("nbn_key", "euring_code", "gbif_id")
    ),
    "species_common_name": TableSpec(
        "species_common_name", ("species", "language"), ("description",)
    ),
    "location": TableSpec(
        "location", ("external_code", "datasource"), ("description", "parent_location")
    ),
    "datafield": TableSpec(
        "datafield", ("datasource", "table_name", "primary_key", "datafield_type"), ()
    ),
    "observation": TableSpec(
        "observation",
        ("external_code", "datafield"),
        ("location", "year", "parent_observation"),
    ),
    "anomaly": TableSpec(
        "anomaly", ("anomaly_type", "analysis", "observation"), ("parameter",)
    ),
}

FINGERPRINT_COL = "fingerprint"


def validate_frame(df: DataFrame, spec: TableSpec) -> DataFrame:
    """The reference's input guards: required columns present (extra columns
    beyond the spec rejected), natural-key columns non-NULL. Returns the
    frame projected to spec order."""
    missing = [c for c in spec.columns if c not in df.columns]
    if missing:
        raise ValidationError(f"{spec.name}: missing required columns {missing}")
    extra = [c for c in df.columns if c not in spec.columns]
    if extra:
        raise ValidationError(f"{spec.name}: unexpected columns {extra}")
    # no-NA on the natural key — checked *before* any write.
    any_null = F.lit(False)
    for c in spec.natural_key:
        any_null = any_null | F.col(c).isNull()
    n_bad = df.filter(any_null).count()
    if n_bad:
        raise ValidationError(f"{spec.name}: {n_bad} rows with NULL natural-key values")
    return df.select(*spec.columns)


def add_fingerprint(df: DataFrame, spec: TableSpec, algo: str = "md5") -> DataFrame:
    """Stable surrogate key = hash of the ordered natural-key values — the
    reference's digest::sha1 idempotence mechanism (md5 default, §7.4.1)."""
    return df.withColumn(FINGERPRINT_COL, fingerprint(list(spec.natural_key), algo))


@dataclass
class N2kStore:
    """Session object bundling a merge backend (the reference's ``conn``).

    ``backend`` is any object with the sources/jdbc.py backend protocol
    (``write_staging`` / ``execute`` / ``drop_staging``) — DbApiBackend
    (DuckDB, psycopg2) or SparkJdbcBackend.
    """

    backend: object
    schema: str = ""  # optional target-schema prefix, e.g. "public"
    hash_algo: str = "md5"
    clean: bool = True  # drop staging after merge (reference's `clean` arg)
    _stored: list = field(default_factory=list)

    def _target(self, table: str) -> str:
        return f"{self.schema}.{table}" if self.schema else table

    def _store(self, df: DataFrame, spec: TableSpec, dedup: bool = True) -> DataFrame:
        frame = validate_frame(df, spec)
        frame = add_fingerprint(frame, spec, self.hash_algo)
        if dedup:
            frame = frame.dropDuplicates([FINGERPRINT_COL])
        if spec.mode == "set_replace":
            upsert(
                frame,
                self._target(spec.name),
                list(spec.group_key),
                self.backend,
                mode="set_replace",
                clean=self.clean,
            )
        else:
            upsert(
                frame,
                self._target(spec.name),
                [FINGERPRINT_COL],
                self.backend,
                mode=spec.mode,
                clean=self.clean,
            )
        self._stored.append(spec.name)
        return frame

    # --- dimension upserts (one per reference store_* export) -------------

    def store_language(self, df: DataFrame) -> DataFrame:
        """⟨pub⟩ R/store_language.R: simplest dim upsert."""
        return self._store(df, TABLE_SPECS["language"])

    def store_datasource_type(self, df: DataFrame) -> DataFrame:
        return self._store(df, TABLE_SPECS["datasource_type"])

    def store_datafield_type(self, df: DataFrame) -> DataFrame:
        return self._store(df, TABLE_SPECS["datafield_type"])

    def store_scheme(self, df: DataFrame) -> DataFrame:
        return self._store(df, TABLE_SPECS["scheme"])

    def store_anomaly_type(self, df: DataFrame) -> DataFrame:
        return self._store(df, TABLE_SPECS["anomaly_type"])

    def store_model_set(self, df: DataFrame) -> DataFrame:
        return self._store(df, TABLE_SPECS["model_set"])

    def store_datasource(self, df: DataFrame) -> DataFrame:
        """⟨pub⟩ R/store_datasource.R: dim upsert; the datasource_type column
        is part of the natural key (server-side id resolution happens in the
        merge SQL's join in the reference; fingerprint-keying subsumes it)."""
        return self._store(df, TABLE_SPECS["datasource"])

    def store_species_group(self, df: DataFrame) -> DataFrame:
        return self._store(df, TABLE_SPECS["species_group"])

    def store_location_group(self, df: DataFrame) -> DataFrame:
        return self._store(df, TABLE_SPECS["location_group"])

    # --- set-replacement membership merges --------------------------------

    def store_species_group_species(self, df: DataFrame) -> DataFrame:
        """⟨pub⟩ R/store_species_group_species.R: membership replaced
        wholesale per species_group present in the batch."""
        return self._store(df, TABLE_SPECS["species_group_species"])

    def store_location_group_location(self, df: DataFrame) -> DataFrame:
        return self._store(df, TABLE_SPECS["location_group_location"])

    def store_datasource_parameter(self, df: DataFrame) -> DataFrame:
        return self._store(df, TABLE_SPECS["datasource_parameter"])

    def store_datasource_value(self, df: DataFrame) -> DataFrame:
        """Composite-natural-key dim (parameter values per datasource)."""
        return self._store(df, TABLE_SPECS["datasource_value"])

    def store_location(self, df: DataFrame) -> DataFrame:
        """⟨pub⟩ R/store_location.R: dim upsert incl. parent-location
        self-reference (parent referenced by its external code; NULL for
        roots)."""
        return self._store(df, TABLE_SPECS["location"])

    def store_species(self, species: DataFrame, common_names: DataFrame | None = None) -> DataFrame:
        """⟨pub⟩ R/store_species.R: multi-df input — species rows plus
        per-language common names keyed to the parent's natural key."""
        stored = self._store(species, TABLE_SPECS["species"])
        if common_names is not None:
            self._store(common_names, TABLE_SPECS["species_common_name"])
        return stored

    def store_datafield(self, datafield: DataFrame, datafield_type: DataFrame | None = None) -> DataFrame:
        """⟨pub⟩ R/store_datafield.R: stores ``datafield_type`` internally
        first (the reference's dependency ordering), then the datafields."""
        if datafield_type is not None:
            self.store_datafield_type(datafield_type)
        return self._store(datafield, TABLE_SPECS["datafield"])

    # --- fact upserts ------------------------------------------------------

    def store_observation(self, observation: DataFrame, datafield: DataFrame | None = None) -> DataFrame:
        """⟨pub⟩ R/store_observation.R (the richest fact-load path): resolves
        the datafield dependency first, then upserts observations keyed by
        (external_code, datafield) fingerprint; parent_observation is a
        self-reference by external code."""
        if datafield is not None:
            self.store_datafield(datafield)
        return self._store(observation, TABLE_SPECS["observation"])

    def store_anomaly(self, anomaly: DataFrame, anomaly_type: DataFrame | None = None) -> DataFrame:
        """⟨pub⟩ R/store_anomaly.R: fact insert with multi-parent resolution
        (type stored first; analysis/observation referenced by fingerprint)."""
        if anomaly_type is not None:
            self.store_anomaly_type(anomaly_type)
        return self._store(anomaly, TABLE_SPECS["anomaly"])

    # --- versioned entities (append-only) ---------------------------------

    def store_versioned_dim(
        self,
        df: DataFrame,
        table: str,
        keys: list[str],
        compare_cols: list[str],
        batch_ts: str,
    ) -> DataFrame:
        """Versioned dimension upsert (beyond the reference surface, same
        idiom): stage the batch and run the full classic SCD2 merge —
        unchanged keys untouched, changed keys closed-and-reopened at
        ``batch_ts``, absent keys closed, new keys opened. Server-side SQL
        is sources.jdbc.sql_merge_scd2_changes; the pure-transform twin
        (operators.merge.merge_scd2_changes) is the oracle-checked
        semantics. The target table must carry valid_from/valid_to
        (VARCHAR, NULL = open)."""
        cols = keys + compare_cols
        missing = [c for c in cols if c not in df.columns]
        if missing:
            raise ValidationError(f"{table}: missing required columns {missing}")
        any_null = F.lit(False)
        for c in keys:
            any_null = any_null | F.col(c).isNull()
        if df.filter(any_null).count():
            raise ValidationError(f"{table}: NULL in key columns {keys}")
        frame = df.select(*cols)
        upsert(
            frame,
            self._target(table),
            keys,
            self.backend,
            mode="scd2_changes",
            clean=self.clean,
            compare_cols=compare_cols,
            batch_ts=batch_ts,
        )
        self._stored.append(table)
        return frame

    def store_analysis(self, analysis: DataFrame, versions: DataFrame | None = None) -> DataFrame:
        """⟨pub⟩ R/store_analysis.R: append-only version chain in FK order —
        analysis rows insert-if-absent, then analysis_version rows keyed to
        the parent fingerprint. 'Current' is derived (latest version), never
        stored."""
        stored = self._store(analysis, TABLE_SPECS["analysis"])
        if versions is not None:
            self._store(versions, TABLE_SPECS["analysis_version"])
        return stored

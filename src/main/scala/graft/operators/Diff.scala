package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Snapshot diffing — derive the changelog a CDC stream would have carried
  * from two FULL table snapshots (the inverse of [[Scd]]'s
  * changelog→snapshot reconstruction, q129): 'insert' rows only in `next`,
  * 'delete' rows only in `prev`, 'update' rows present in both with at least
  * one differing value column. The differing column names ride along
  * (sorted, comma-joined) so downstream consumers can route column-level
  * invalidations, and the changelog is APPLYABLE: `old_vals`/`new_vals`
  * carry the stringified per-column values (changed columns for updates,
  * the full value set for inserts/deletes), so [[applyDiff]] can replay the
  * diff onto `prev` and reproduce `next` exactly (PropertySpec pins the
  * round-trip). Unchanged rows are dropped.
  *
  * Scale shape: one hash shuffle per side on the key for the full-outer
  * join; at 100 TB both snapshots are bucketed on the key and the join is
  * co-located, making the nightly snapshot diff a map-side zip. Comparison
  * is null-safe (`<=>`), so NULL→value and value→NULL transitions are
  * updates, not misses. Side presence is carried by explicit markers, NOT
  * inferred from key nullability — a row whose key value is itself NULL
  * never joins and surfaces as one 'insert' plus one 'delete' (with NULL
  * key), classified correctly on each side.
  */
object Diff {

  private val ChangedMark = "__changed"

  def snapshotDiff(prev: DataFrame, next: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    require(prev.columns.sameElements(next.columns),
      s"snapshots must share a schema, got ${prev.columns.toSeq} vs ${next.columns.toSeq}")
    val valCols = prev.columns.filterNot(keyCols.contains).sorted
    val p = prev.select(prev.columns.map(c => col(c).as(s"__p_$c")).toSeq
      :+ lit(1).as("__p_present"): _*)
    val n = next.select(next.columns.map(c => col(c).as(s"__n_$c")).toSeq
      :+ lit(1).as("__n_present"): _*)
    val joined = p.join(n,
      keyCols.map(k => col(s"__p_$k") === col(s"__n_$k")).reduce(_ && _), "full_outer")
    // presence markers survive NULL key values; key-column nullability does not
    val changeType = when(col("__p_present").isNull, lit("insert"))
      .when(col("__n_present").isNull, lit("delete"))
      .otherwise(lit("update"))
    val changedFlags = valCols.map(c => !(col(s"__p_$c") <=> col(s"__n_$c")))
    val changedList = array_join(filter(
      array(valCols.zip(changedFlags).map { case (c, f) => when(f, lit(c)) }.toSeq: _*),
      x => x.isNotNull), ",")
    // value maps: entry structs filtered to the wanted column set, then
    // map_from_entries — all inside codegen, no UDFs
    def entries(side: String, onlyChanged: Boolean) = map_from_entries(filter(
      array(valCols.zip(changedFlags).map { case (c, f) =>
        val e = struct(lit(c).as("key"), col(s"__${side}_$c").cast("string").as("value"))
        if (onlyChanged) when(f, e) else e
      }.toSeq: _*), x => x.isNotNull))
    val emptyMap = typedLit(Map.empty[String, String])
    joined
      .withColumn("change_type", changeType)
      // changed columns are only meaningful for updates (an absent side
      // "differs" in every column)
      .withColumn("changed_cols",
        when(col("change_type") === "update", changedList).otherwise(lit("")))
      .withColumn("old_vals",
        when(col("change_type") === "insert", emptyMap)
          .when(col("change_type") === "delete", entries("p", onlyChanged = false))
          .otherwise(entries("p", onlyChanged = true)))
      .withColumn("new_vals",
        when(col("change_type") === "delete", emptyMap)
          .when(col("change_type") === "insert", entries("n", onlyChanged = false))
          .otherwise(entries("n", onlyChanged = true)))
      .filter(col("__p_present").isNull || col("__n_present").isNull ||
        col("changed_cols") =!= "")
      .select(keyCols.map(k => coalesce(col(s"__p_$k"), col(s"__n_$k")).as(k)) ++
        Seq(col("change_type"), col("changed_cols"),
          col("old_vals"), col("new_vals")): _*)
      .orderBy(keyCols.map(col): _*)
  }

  /** Replay a [[snapshotDiff]] changelog onto `prev`: delete 'delete' keys,
    * append 'insert' rows rebuilt from `new_vals`, patch 'update' rows
    * column-wise (a key present in `new_vals` overwrites — including with
    * NULL, which `map_contains_key` distinguishes from "not changed").
    * Values round-trip through strings with Spark's own cast in both
    * directions, so diff→apply ≡ next holds exactly for the primitive
    * types (PropertySpec); binary columns would be lossy and are rejected.
    *
    * NULL-keyed rows are replayed too: they diff as one 'insert' plus one
    * 'delete' (a NULL key never equi-joins), so the replay deletes them by
    * FULL-ROW serialization instead of by key — for each distinct
    * serialized (key, old_vals) delete group of size k, the k matching
    * `prev` rows are removed (the rows are byte-identical under the
    * serialization, so which k is immaterial — the multiset result is
    * deterministic). Inserts append as usual. The serialization drops
    * NULL-valued columns on both sides (mirroring the `old_vals` map
    * fragments), so null-pattern agreement is part of the match.
    *
    * Scale shape: one keyed left join prev⋈diff plus a union of the
    * (typically small) insert slice — same bucketing story as the diff.
    * The NULL-key leg joins only the NULL-keyed slices of both sides
    * (normally ~empty; broadcast-sized whenever keys are near-complete).
    */
  def applyDiff(prev: DataFrame, diff: DataFrame, keyCols: Seq[String]): DataFrame = {
    val schema = prev.schema
    require(!schema.exists(_.dataType.typeName == "binary"),
      "applyDiff: binary columns do not round-trip through stringified diffs")
    val valCols = prev.columns.filterNot(keyCols.contains)
    def keyIsNull = keyCols.map(k => col(k).isNull).reduce(_ || _)

    // delimiter escaping: a raw value containing ';'/'='/the control
    // markers could make two DISTINCT rows serialize identically (e.g.
    // a="x;b=y",b=NULL vs a="x",b="y" — found in review), and the multiset
    // delete below would then remove an arbitrary one of them under a
    // partial replay. Escaping backslash first makes the serialization
    // injective. Column NAMES are schema identifiers and pass through raw.
    def esc(c: Column): Column =
      Seq("\\" -> "\\\\", ";" -> "\\;", "=" -> "\\=",
          "\u0000" -> "\\\u0000", "\u0001" -> "\\\u0001")
        .foldLeft(c) { case (acc, (s, r)) =>
          call_function("replace", acc, lit(s), lit(r)) }
    // key serialization: NULL marked out-of-band (no '=' separator), so a
    // literal NUL VALUE ("k=" + NUL) can never collide with NULL ("k" + NUL)
    def keySer = concat_ws("\u0001", keyCols.map(k =>
      concat(lit(k), when(col(k).isNull, lit("\u0000"))
        .otherwise(concat(lit("="), esc(col(k).cast("string")))))): _*)
    // value serialization: one "c=v" fragment per NON-NULL column — the same
    // drop-null-entries rule as the old_vals map, so both sides agree
    def valSerFrom(value: String => Column) = array_join(filter(
      array(valCols.map(c => when(value(c).isNotNull,
        concat(lit(c), lit("="), esc(value(c).cast("string"))))).toSeq: _*),
      x => x.isNotNull), ";")

    // --- non-NULL-key rows: keyed left join, patch updates, drop deletes
    val d = diff.select(keyCols.map(col) :+ col("change_type") :+ col("new_vals"): _*)
      .filter(!keyIsNull)
    val patched = prev.filter(!keyIsNull).join(d, keyCols.toSeq, "left")
      .filter(col("change_type").isNull || col("change_type") === "update")
      .select(prev.columns.map { c =>
        if (keyCols.contains(c)) col(c)
        else when(col("change_type") === "update" && map_contains_key(col("new_vals"), c),
            try_element_at(col("new_vals"), lit(c)).cast(schema(c).dataType))
          .when(col("change_type") === "update", col(c))
          .otherwise(col(c)).as(c)
      }.toSeq: _*)

    // --- NULL-key rows: multiset delete by serialized-row match
    val nullDeletes = diff.filter(col("change_type") === "delete" && keyIsNull)
      .select(concat_ws("", keySer,
        valSerFrom(c => try_element_at(col("old_vals"), lit(c)))).as("__ser"))
      .groupBy("__ser").agg(count(lit(1)).as("__n_del"))
    val keptNull = prev.filter(keyIsNull)
      .withColumn("__ser", concat_ws("", keySer, valSerFrom(col)))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("__ser").orderBy(lit(1))))
      .join(nullDeletes, Seq("__ser"), "left")
      .filter(col("__n_del").isNull || col("__rn") > col("__n_del"))
      .select(prev.columns.map(col).toSeq: _*)

    // --- inserts (NULL-keyed included): rebuild from new_vals
    val inserts = diff.filter(col("change_type") === "insert")
      .select(prev.columns.map { c =>
        if (keyCols.contains(c)) col(c)
        else try_element_at(col("new_vals"), lit(c)).cast(schema(c).dataType).as(c)
      }.toSeq: _*)
    patched.unionByName(keptNull).unionByName(inserts)
  }
}

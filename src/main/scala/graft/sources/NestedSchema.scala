package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, struct, when}
import org.apache.spark.sql.types._

/** NESTED (struct-field) schema evolution support — the dotted-path
  * algebra shared by the ordinary read path ([[Lakehouse.alignToDeclared]])
  * and the SPJ/DSv2 read path ([[graft.spj]]'s per-variant conform).
  *
  * The reference's data model is nested documents (mongo_to_iceberg.py:
  * 36-60 declares `shipping_address{city,state,zip}` and `items[]`;
  * silver_transformation.py:47-58 does struct surgery on exactly that
  * shape), and Iceberg evolves nested fields routinely — so `ALTER
  * TABLE t ADD/RENAME/DROP COLUMN` accepts dotted paths
  * (`shipping_address.country`) as metadata-only snapshots. Everything
  * here is NAME-based, like the top-level machinery: a rename is
  * recorded as a `from>to` pair of FULL dotted paths (each in the
  * names current at its commit), and resolution folds those pairs
  * prefix-aware, so a later rename of a PARENT struct transparently
  * re-roots its children's earlier renames.
  *
  * Paths cross STRUCT levels and — r15, second pass — ARRAYS OF
  * STRUCTS via the `element` segment (`items.element.sku`, Iceberg's
  * own addressing; the reference's `items[]` shape): per-element
  * conforms ride `transform()` on the ordinary path and a pre-bound
  * `ArrayTransform` in the SPJ projection. MAP VALUES evolve too
  * (r16) via the `value` segment (`attrs.value.unit`, Iceberg's own
  * addressing): per-entry conforms ride `transform_values()` on the
  * ordinary path and a pre-bound `TransformValues` in the SPJ
  * projection. Map KEYS stay structural (no `key` evolution — a key
  * is the entry's identity; rewrite under an explicit schema
  * instead). */
/** `ADD COLUMN … DEFAULT <literal>` (r15) — Iceberg-v3-style INITIAL
  * DEFAULTS as pure metadata, stored under Spark's OWN column-default
  * keys in the declared schema's StructField metadata (so Spark's
  * analyzer resolves `INSERT` statements that omit the column, and
  * `schema.json` round-trips the default through the `_schemas.jsonl`
  * ledger for free):
  *  - `EXISTS_DEFAULT` — what rows written BEFORE the column existed
  *    read (both read paths bind it where they null-filled);
  *  - `CURRENT_DEFAULT` — what writes that omit the column get.
  * Only plain FOLDABLE literals are accepted (validated at ALTER
  * time): the read paths re-parse the SQL text into a [[Literal]]
  * inside projections, which must never need an analyzer. */
private[graft] object ColumnDefaults {
  val CurrentKey = "CURRENT_DEFAULT"
  val ExistsKey = "EXISTS_DEFAULT"

  def existsSql(f: StructField): Option[String] =
    if (f.metadata.contains(ExistsKey)) Some(f.metadata.getString(ExistsKey))
    else None

  def currentSql(f: StructField): Option[String] =
    if (f.metadata.contains(CurrentKey)) Some(f.metadata.getString(CurrentKey))
    else None

  /** Attach both default keys to a field. */
  def withDefault(f: StructField, sql: String): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putString(CurrentKey, sql).putString(ExistsKey, sql).build())

  /** Parse a default's SQL text into the typed literal the read paths
    * bind; throws (loudly, with the column named) on anything that is
    * not a plain literal castable to the column type. */
  def literalFor(sql: String, dt: DataType, name: String, tz: String = "UTC")
      : org.apache.spark.sql.catalyst.expressions.Literal = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    val parsed = try
      org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(sql)
    catch { case e: Exception => throw new IllegalArgumentException(
      s"cannot parse DEFAULT for column $name: $sql: ${e.getMessage}") }
    val lit = parsed match {
      case l: Literal => l
      case other => throw new IllegalArgumentException(
        s"DEFAULT for column $name must be a plain literal, got: $sql " +
          s"(${other.getClass.getSimpleName})")
    }
    if (lit.dataType == dt) lit
    else {
      require(Cast.canAnsiCast(lit.dataType, dt),
        s"DEFAULT $sql (${lit.dataType.simpleString}) cannot become " +
          s"column $name's ${dt.simpleString}")
      Literal.create(Cast(lit, dt, Some(tz), ansiEnabled = true).eval(null), dt)
    }
  }

  /** The fill for a column a dir predates: its EXISTS_DEFAULT literal
    * when declared, else a typed NULL — Column form (ordinary path). */
  def fillColumn(f: StructField): Column =
    existsSql(f) match {
      case Some(sql) =>
        literalFor(sql, f.dataType, f.name) // validate eagerly, loudly
        org.apache.spark.sql.functions.expr(sql).cast(f.dataType)
      case None => org.apache.spark.sql.functions.lit(null).cast(f.dataType)
    }

  /** Expression form (the SPJ projection). */
  def fillExpr(f: StructField, tz: String)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    existsSql(f) match {
      case Some(sql) => literalFor(sql, f.dataType, f.name, tz)
      case None =>
        org.apache.spark.sql.catalyst.expressions.Literal.create(null, f.dataType)
    }
}

private[graft] object NestedSchema {
  private def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)

  /** `cur` equals `name` or starts with `name` + "." (segment-aware,
    * case-insensitive). */
  private def atOrUnder(cur: String, name: String): Boolean =
    cur.equalsIgnoreCase(name) ||
      (cur.length > name.length &&
        cur.regionMatches(true, 0, name, 0, name.length) &&
        cur.charAt(name.length) == '.')

  private def rebase(cur: String, from: String, to: String): String =
    if (cur.equalsIgnoreCase(from)) to else to + cur.substring(from.length)

  /** Map a PHYSICAL dotted path forward through renames (commit
    * order) to its declared name. Prefix-aware: a parent rename moves
    * every child path with it. */
  def fwdPath(renames: Seq[(String, String)], path: String): String =
    renames.foldLeft(path) { case (cur, (from, to)) =>
      if (atOrUnder(cur, from)) rebase(cur, from, to) else cur
    }

  /** Map a DECLARED dotted path backward through renames (reverse
    * commit order) to the physical name a dir written before them
    * carries. */
  def revPath(renames: Seq[(String, String)], path: String): String =
    renames.reverseIterator.foldLeft(path) { case (cur, (from, to)) =>
      if (atOrUnder(cur, to)) rebase(cur, to, from) else cur
    }

  /** Every dotted path a schema declares, structs recursed (the
    * intermediate struct paths included). Feeds the recycled-name
    * refusal: uniqueness is per FULL dotted path, i.e. per struct
    * scope — `a.id` and `b.id` coexist, re-adding a dropped `a.id`
    * refuses. */
  def flatPaths(st: StructType, prefix: String = ""): Seq[String] =
    st.fields.toSeq.flatMap { f =>
      val p = prefix + f.name
      p +: (f.dataType match {
        case s: StructType => flatPaths(s, p + ".")
        case ArrayType(s: StructType, _) => flatPaths(s, p + ".element.")
        case MapType(_, s: StructType, _) => flatPaths(s, p + ".value.")
        case _ => Nil
      })
    }

  /** Resolve `path` (root segment excluded — pass the ROOT's type) to
    * the chain of (owner struct, field) pairs, refusing non-struct
    * crossings. */
  def split(dotted: String): Seq[String] = dotted.split('.').toSeq

  /** The parent StructType at `parentPath` (Nil = the schema itself).
    * Crossed levels must be structs or — via the `element` segment —
    * arrays of structs; anything else refuses loudly. */
  def parentAt(schema: StructType, parentPath: Seq[String],
      table: String): StructType = {
    val end = parentPath.foldLeft(schema: DataType) { (cur, seg) =>
      cur match {
        case ArrayType(et, _) =>
          require(seg.equalsIgnoreCase("element"),
            s"cannot evolve under an array by field name ($seg) — address " +
              s"its elements as 'element' (${parentPath.mkString(".")})")
          et
        case MapType(_, vt, _) =>
          require(seg.equalsIgnoreCase("value"),
            s"cannot evolve under a map by field name ($seg) — address its " +
              s"values as 'value' (${parentPath.mkString(".")}); map KEYS are " +
              "the entries' identity and do not evolve")
          vt
        case st: StructType =>
          st.fields.find(_.name.equalsIgnoreCase(seg)).getOrElse(
            throw new IllegalArgumentException(
              s"$table has no column ${parentPath.mkString(".")}: $seg not found"))
            .dataType
        case other => throw new IllegalArgumentException(
          s"cannot evolve under $seg: it is a ${other.simpleString}, not a " +
            "struct — nested evolution crosses structs, arrays of structs " +
            "and map values only")
      }
    }
    end match {
      case st: StructType => st
      case ArrayType(_: StructType, _) => throw new IllegalArgumentException(
        s"${parentPath.mkString(".")} is an array of structs — evolve its " +
          "fields under '.element' (Iceberg's addressing)")
      case MapType(_, _: StructType, _) => throw new IllegalArgumentException(
        s"${parentPath.mkString(".")} is a map of structs — evolve its " +
          "value fields under '.value' (Iceberg's addressing)")
      case other => throw new IllegalArgumentException(
        s"cannot evolve under ${parentPath.mkString(".")}: it is a " +
          s"${other.simpleString}, not a struct")
    }
  }

  /** Rebuild `schema` with the struct at `parentPath` replaced by
    * `f(itself)`. Crossings validated by [[parentAt]] first. */
  def updateParent(schema: StructType, parentPath: Seq[String])
      (f: StructType => StructType): StructType =
    updateAt(schema, parentPath)(f).asInstanceOf[StructType]

  private def updateAt(dt: DataType, path: Seq[String])
      (f: StructType => StructType): DataType =
    path match {
      case Seq() => f(dt.asInstanceOf[StructType])
      case seg +: rest => dt match {
        case ArrayType(et, n) => ArrayType(updateAt(et, rest)(f), n)
        case MapType(kt, vt, n) => MapType(kt, updateAt(vt, rest)(f), n)
        case st: StructType =>
          StructType(st.fields.map { fld =>
            if (fld.name.equalsIgnoreCase(seg))
              fld.copy(dataType = updateAt(fld.dataType, rest)(f))
            else fld
          })
        case other => throw new IllegalStateException(
          s"updateAt crossed a ${other.simpleString} (validated walk should refuse)")
      }
    }

  /** Does conforming `phys` to `decl` need more than a Cast — i.e. is
    * a by-name struct rebuild involved anywhere inside? */
  def structConform(phys: DataType, decl: DataType): Boolean =
    (phys, decl) match {
      case (p: StructType, d: StructType) =>
        p.fields.map(f => lc(f.name)).toSeq !=
          d.fields.map(f => lc(f.name)).toSeq ||
          p.fields.zip(d.fields).exists { case (pf, df) =>
            structConform(pf.dataType, df.dataType) }
      case (ArrayType(p, _), ArrayType(d, _)) => structConform(p, d)
      case (MapType(_, p, _), MapType(_, d, _)) => structConform(p, d)
      case _ => false
    }

  /** Conform a physical COLUMN to its declared type by NAME: structs
    * rebuild recursively (declared order; fields the dir predates
    * null-fill; dropped fields project away; renames resolve each
    * declared child back to its physical name), leaves up-cast when
    * widened. A null struct VALUE stays null — the rebuild must not
    * manufacture a struct of nulls where the row stored none. */
  def conformColumn(src: Column, phys: DataType, decl: DataType,
      declPath: String, renames: Seq[(String, String)]): Column =
    (phys, decl) match {
      case (p, d) if p == d && !structConform(p, d) => src
      // ARRAY OF STRUCTS: per-element conform through transform();
      // a null array stays null (transform propagates it)
      case (ArrayType(pe, _), ArrayType(de, dn)) =>
        org.apache.spark.sql.functions.transform(src, x =>
          conformColumn(x, pe, de, declPath + ".element", renames))
          .cast(ArrayType(de, dn))
      // MAP OF STRUCT VALUES: per-entry conform through
      // transform_values(); keys pass through untouched (they are the
      // entries' identity — no key evolution) and a null map stays null
      case (MapType(_, pv, _), MapType(dk, dv, dn)) =>
        org.apache.spark.sql.functions.transform_values(src, (_, v) =>
          conformColumn(v, pv, dv, declPath + ".value", renames))
          .cast(MapType(dk, dv, dn))
      case (p: StructType, d: StructType) =>
        val built = struct(d.fields.toSeq.map { df =>
          val childDecl = declPath + "." + df.name
          val physLeaf = split(revPath(renames, childDecl)).last
          p.fields.find(_.name.equalsIgnoreCase(physLeaf)) match {
            case None => ColumnDefaults.fillColumn(df).as(df.name)
            case Some(pf) =>
              conformColumn(src.getField(pf.name), pf.dataType, df.dataType,
                childDecl, renames).as(df.name)
          }
        }: _*)
        when(src.isNull, lit(null).cast(d)).otherwise(built.cast(d))
      case (p, d) if p == d => src
      case (_, d) => src.cast(d)
    }

  /** [[conformColumn]] at the Catalyst Expression level — the SPJ
    * reader's per-variant UnsafeProjection conforms physical struct
    * shapes with this (a plain Cast resolves struct casts
    * POSITIONALLY, which is exactly wrong for by-name evolution). */
  def conformExpr(src: org.apache.spark.sql.catalyst.expressions.Expression,
      phys: DataType, decl: DataType, declPath: String,
      renames: Seq[(String, String)], tz: String)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    (phys, decl) match {
      case (p, d) if p == d && !structConform(p, d) => src
      // ARRAY OF STRUCTS: a PRE-BOUND ArrayTransform (the lambda
      // variable is constructed named, not unresolved — exactly what
      // the analyzer's bind would produce, so the projection needs no
      // analysis; higher-order functions evaluate via CodegenFallback
      // inside UnsafeProjection, which is fine for evolved dirs)
      case (ArrayType(pe, pn), ArrayType(de, _)) =>
        val lv = NamedLambdaVariable("el", pe, pn)
        val body = conformExpr(lv, pe, de, declPath + ".element", renames, tz)
        ArrayTransform(src, LambdaFunction(body, Seq(lv)))
      // MAP OF STRUCT VALUES: a pre-bound TransformValues, same
      // no-analyzer contract as the ArrayTransform leg — the (key,
      // value) lambda variables are constructed named, the key rides
      // through untouched
      case (MapType(pk, pv, pn), MapType(_, dv, _)) =>
        val kv = NamedLambdaVariable("k", pk, nullable = false)
        val vv = NamedLambdaVariable("v", pv, pn)
        val body = conformExpr(vv, pv, dv, declPath + ".value", renames, tz)
        TransformValues(src, LambdaFunction(body, Seq(kv, vv)))
      case (p: StructType, d: StructType) =>
        val children = d.fields.toSeq.flatMap { df =>
          val childDecl = declPath + "." + df.name
          val physLeaf = split(revPath(renames, childDecl)).last
          val pi = p.fields.indexWhere(_.name.equalsIgnoreCase(physLeaf))
          val value =
            if (pi < 0) ColumnDefaults.fillExpr(df, tz)
            else conformExpr(GetStructField(src, pi, Some(p.fields(pi).name)),
              p.fields(pi).dataType, df.dataType, childDecl, renames, tz)
          Seq(Literal(org.apache.spark.unsafe.types.UTF8String.fromString(df.name),
            StringType), value)
        }
        If(IsNull(src), Literal.create(null, d), CreateNamedStruct(children))
      case (p, d) if p == d => src
      case (_, d) => Cast(src, d, Some(tz))
    }
  }
}

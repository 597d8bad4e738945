package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** The SQL-facing lakehouse surface: a DSv2 `TableCatalog`
  * (CREATE/INSERT/SELECT/time-travel on catalog identifiers) and SQL
  * DML (DELETE/UPDATE/MERGE routed to the transactional writer). The
  * identical-logs test is the core contract: the SQL door and the
  * Scala door must commit indistinguishable tables. */
class SqlDmlSpec extends SparkTestBase {

  private var n = 0
  /** A fresh catalog per test: CatalogManager caches instances by
    * name, so each test registers its own name + warehouse. */
  private def freshCatalog(): String = synchronized {
    n += 1
    val name = s"gtest$n"
    val wh = graft.io.Staging.tempDir(s"graft_cat_$n")
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.io.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    name
  }

  /** The per-commit `operation` strings of a table's log — the probe
    * the identical-logs test compares. */
  private def operations(table: String): Seq[String] = {
    val log = Paths.get(table, "_delta_log")
    val st = Files.list(log)
    val commits = try st.iterator().asScala
      .filter(_.getFileName.toString.matches("\\d{20}\\.json")).toSeq.sortBy(_.toString)
      finally st.close()
    commits.map { p =>
      val lines = Files.readAllLines(p).asScala
      lines.collectFirst {
        case l if l.contains("\"commitInfo\"") =>
          "\"operation\":\"([^\"]+)\"".r.findFirstMatchIn(l).map(_.group(1)).getOrElse("?")
      }.getOrElse("?")
    }
  }

  test("catalog: create / insert / select / time travel / overwrite / drop") {
    val c = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $c.db")
    spark.sql(s"CREATE TABLE $c.db.t (id BIGINT, s STRING) USING `graft-delta`")
    spark.sql(s"INSERT INTO $c.db.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO $c.db.t VALUES (3, 'c')")
    assert(spark.sql(s"SELECT count(*) FROM $c.db.t").head.getLong(0) == 3)
    assert(spark.sql(s"SELECT s FROM $c.db.t WHERE id = 2").head.getString(0) == "b")
    // v0 CREATE, v1/v2 inserts — time travel through the catalog hook
    assert(spark.sql(s"SELECT count(*) FROM $c.db.t VERSION AS OF 0").head.getLong(0) == 0)
    assert(spark.sql(s"SELECT count(*) FROM $c.db.t VERSION AS OF 1").head.getLong(0) == 2)
    spark.sql(s"INSERT OVERWRITE $c.db.t VALUES (CAST(9 AS BIGINT), 'z')")
    assert(spark.sql(s"SELECT count(*) FROM $c.db.t").head.getLong(0) == 1)
    assert(spark.sql(s"SHOW TABLES IN $c.db").collect().map(_.getString(1)).contains("t"))
    spark.sql(s"DROP TABLE $c.db.t")
    assert(spark.sql(s"SHOW TABLES IN $c.db").collect().isEmpty)
  }

  test("catalog: CTAS, partitioned create, tblproperties round-trip") {
    val c = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $c.db")
    spark.sql(s"CREATE TABLE $c.db.src USING `graft-delta` AS " +
      "SELECT CAST(id AS BIGINT) AS id, CAST(id % 3 AS STRING) AS part " +
      "FROM range(30)")
    assert(spark.sql(s"SELECT count(*) FROM $c.db.src").head.getLong(0) == 30)
    spark.sql(s"CREATE TABLE $c.db.p (id BIGINT, part STRING) USING `graft-delta` " +
      "PARTITIONED BY (part) TBLPROPERTIES ('graft.owner' = 'spec')")
    spark.sql(s"INSERT INTO $c.db.p SELECT id, part FROM $c.db.src")
    assert(spark.sql(s"SELECT count(*) FROM $c.db.p WHERE part = '1'").head.getLong(0) == 10)
    val props = spark.sql(s"SHOW TBLPROPERTIES $c.db.p").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.owner").contains("spec"))
    spark.sql(s"ALTER TABLE $c.db.p SET TBLPROPERTIES ('graft.tier' = 'gold')")
    spark.sql(s"ALTER TABLE $c.db.p UNSET TBLPROPERTIES ('graft.owner')")
    val props2 = spark.sql(s"SHOW TBLPROPERTIES $c.db.p").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props2.get("graft.tier").contains("gold") && !props2.contains("graft.owner"))
  }

  test("SQL DELETE: arbitrary predicate, DV path, head semantics") {
    val c = freshCatalog()
    spark.sql(s"CREATE TABLE $c.t (id BIGINT, s STRING) USING `graft-delta`")
    spark.sql(s"INSERT INTO $c.t SELECT CAST(id AS BIGINT), " +
      "CAST(id % 4 AS STRING) FROM range(100)")
    spark.sql(s"DELETE FROM $c.t WHERE id % 2 = 0 AND length(s) > 0")
    assert(spark.sql(s"SELECT count(*) FROM $c.t").head.getLong(0) == 50)
    assert(spark.sql(s"SELECT min(id) FROM $c.t").head.getLong(0) == 1)
    // unconditional DELETE empties the table
    spark.sql(s"DELETE FROM $c.t")
    assert(spark.sql(s"SELECT count(*) FROM $c.t").head.getLong(0) == 0)
  }

  test("SQL UPDATE: simultaneous assignment over the pre-image") {
    val c = freshCatalog()
    spark.sql(s"CREATE TABLE $c.u (a BIGINT, b BIGINT, s STRING) USING `graft-delta`")
    spark.sql(s"INSERT INTO $c.u SELECT CAST(id AS BIGINT), " +
      "CAST(id * 10 AS BIGINT), CAST(id AS STRING) FROM range(20)")
    // SET a = b, b = a must SWAP (both RHS see the pre-image)
    spark.sql(s"UPDATE $c.u SET a = b, b = a WHERE a < 5")
    val swapped = spark.sql(s"SELECT a, b FROM $c.u WHERE s = '3'").head
    assert(swapped.getLong(0) == 30 && swapped.getLong(1) == 3)
    // untouched rows keep their values; NULL-condition rows are kept
    val kept = spark.sql(s"SELECT a, b FROM $c.u WHERE s = '7'").head
    assert(kept.getLong(0) == 7 && kept.getLong(1) == 70)
    // after the swap, a>=30 holds only for swapped rows 3 (a=30) and 4 (a=40)
    spark.sql(s"UPDATE $c.u SET s = concat(s, '!') WHERE a >= 30")
    assert(spark.sql(s"SELECT count(*) FROM $c.u WHERE s LIKE '%!'").head.getLong(0) == 2)
    // an ALL-identity statement (`SET a = a`) is still a REAL update —
    // Delta rewrites and emits CDC for it; it must not trip the
    // writer's 'no assignments' require at runtime
    val wh = spark.conf.get(s"spark.sql.catalog.$c.warehouse") + "/u"
    val vBefore = graft.io.DeltaRead.latestVersion(wh)
    spark.sql(s"UPDATE $c.u SET a = a WHERE s = '9'")
    assert(graft.io.DeltaRead.latestVersion(wh) == vBefore + 1,
      "SET a = a must commit a rewrite, not throw or no-op")
    assert(spark.sql(s"SELECT a FROM $c.u WHERE s = '9'").head.getLong(0) == 9)
  }

  test("SQL MERGE: upsert, conditional clauses, delete clause") {
    val c = freshCatalog()
    spark.sql(s"CREATE TABLE $c.m (id BIGINT, v BIGINT) USING `graft-delta`")
    spark.sql(s"INSERT INTO $c.m SELECT CAST(id AS BIGINT), " +
      "CAST(id AS BIGINT) FROM range(10)")
    // upsert: update 0..9 where even, insert 10..14
    spark.sql(
      s"""MERGE INTO $c.m t
         |USING (SELECT CAST(id AS BIGINT) AS id, CAST(id * 100 AS BIGINT) AS v
         |       FROM range(15)) s
         |ON t.id = s.id
         |WHEN MATCHED AND s.v % 200 = 0 THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val m = spark.sql(s"SELECT id, v FROM $c.m ORDER BY id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(2) == 200 && m(3) == 3 && m(12) == 1200 && m.size == 15)
    // delete clause wins per first-match-wins ordering
    spark.sql(
      s"""MERGE INTO $c.m t
         |USING (SELECT CAST(id AS BIGINT) AS id, CAST(0 AS BIGINT) AS v
         |       FROM range(5)) s
         |ON t.id = s.id
         |WHEN MATCHED AND s.id < 3 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    val after = spark.sql(s"SELECT id, v FROM $c.m ORDER BY id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!after.contains(0) && !after.contains(2) && after(3) == 0 &&
      after(4) == 0 && after(5) == 5 && after.size == 12)
  }

  test("SQL MERGE general: partial SET, ordered clauses, BY SOURCE, partial INSERT") {
    val c = freshCatalog()
    spark.sql(s"CREATE TABLE $c.g (id BIGINT, v BIGINT, s STRING) USING `graft-delta`")
    spark.sql(s"INSERT INTO $c.g SELECT CAST(id AS BIGINT), " +
      "CAST(id * 10 AS BIGINT), concat('r', id) FROM range(10)")
    spark.sql(
      s"""MERGE INTO $c.g t
         |USING (SELECT CAST(id AS BIGINT) AS id, CAST(id * 100 AS BIGINT) AS bonus
         |       FROM range(13) WHERE id >= 5) s
         |ON t.id = s.id
         |WHEN MATCHED AND t.v >= 80 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = t.v + s.bonus
         |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.bonus)
         |WHEN NOT MATCHED BY SOURCE AND t.id < 2 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET s = 'stale'""".stripMargin)
    val out = spark.sql(s"SELECT id, v, s FROM $c.g ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSeq
    assert(out == Seq(
      (2L, 20L, Some("stale")), (3L, 30L, Some("stale")), (4L, 40L, Some("stale")),
      (5L, 550L, Some("r5")), (6L, 660L, Some("r6")), (7L, 770L, Some("r7")),
      (10L, 1000L, None), (11L, 1100L, None), (12L, 1200L, None)),
      s"got $out")
  }

  test("SQL and Scala DML commit identical tables and logs") {
    import spark.implicits._
    val c = freshCatalog()
    val scalaT = graft.io.Staging.tempDir("graft_dml_scala_")
    val seed = spark.range(0, 50).select($"id",
      ($"id" * 7).as("v"), concat(lit("r"), $"id").as("s"))
    spark.sql(s"CREATE TABLE $c.twin (id BIGINT, v BIGINT, s STRING) USING `graft-delta`")
    spark.sql(s"INSERT INTO $c.twin SELECT id, id * 7, concat('r', id) FROM range(50)")
    graft.io.DeltaWrite.createEmpty(spark, scalaT,
      seed.schema, Nil, Map.empty)
    graft.io.DeltaWrite.append(seed, scalaT)

    spark.sql(s"DELETE FROM $c.twin WHERE id % 5 = 0")
    graft.io.DeltaWrite.deleteWhere(spark, scalaT, pmod($"id", lit(5)) === 0)

    spark.sql(s"UPDATE $c.twin SET v = v + 1, s = upper(s) WHERE id < 10")
    graft.io.DeltaWrite.updateWhere(spark, scalaT, $"id" < 10,
      Seq("v" -> ($"v" + 1), "s" -> upper($"s")))

    val src = spark.range(45, 55).select($"id",
      lit(-1L).as("v"), lit("merged").as("s"))
    src.createOrReplaceTempView("dml_twin_src")
    spark.sql(
      s"""MERGE INTO $c.twin t USING dml_twin_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    graft.io.DeltaWrite.merge(spark, scalaT, src, Seq("id"))

    // identical contents…
    val whT = spark.conf.get(s"spark.sql.catalog.$c.warehouse") + "/twin"
    val sqlDf = graft.io.DeltaRead.read(spark, whT).orderBy($"id")
    val scalaDf = graft.io.DeltaRead.read(spark, scalaT).orderBy($"id")
    assert(sqlDf.collect().toSeq == scalaDf.collect().toSeq)
    // …and identical log shapes: same version count, same operations
    assert(operations(whT).drop(2) == operations(scalaT).drop(2),
      s"sql=${operations(whT)} scala=${operations(scalaT)}")
    assert(operations(whT).size == operations(scalaT).size)
  }

  test("INSERT OVERWRITE PARTITION replaces only the named partition") {
    val c = freshCatalog()
    spark.sql(s"CREATE TABLE $c.po (id BIGINT, p STRING) USING `graft-delta` " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO $c.po SELECT CAST(id AS BIGINT), " +
      "CAST(id % 3 AS STRING) FROM range(30)")
    val beforeP0 = graft.io.DeltaRead.snapshot(spark,
      spark.conf.get(s"spark.sql.catalog.$c.warehouse") + "/po").files
      .filter(_.partitionValues.get("p").contains("0")).map(_.path).toSet
    // one commit: partition 1 is replaced by two rows, 0 and 2 untouched
    spark.sql(s"INSERT OVERWRITE $c.po PARTITION (p = '1') " +
      "VALUES (CAST(1000 AS BIGINT)), (CAST(1001 AS BIGINT))")
    val out = spark.sql(s"SELECT p, count(*) AS n, max(id) AS mx FROM $c.po " +
      "GROUP BY p ORDER BY p").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("0", 10L, 27L), ("1", 2L, 1001L), ("2", 10L, 29L)))
    val afterP0 = graft.io.DeltaRead.snapshot(spark,
      spark.conf.get(s"spark.sql.catalog.$c.warehouse") + "/po").files
      .filter(_.partitionValues.get("p").contains("0")).map(_.path).toSet
    assert(beforeP0 == afterP0, "untouched partitions must keep their bytes")
  }

  test("MERGE: a NULL first-clause condition falls through to later clauses") {
    val c = freshCatalog()
    spark.sql(s"CREATE TABLE $c.n (id BIGINT, v BIGINT) USING `graft-delta`")
    spark.sql(s"INSERT INTO $c.n VALUES (CAST(1 AS BIGINT), CAST(10 AS BIGINT)), " +
      "(CAST(2 AS BIGINT), CAST(20 AS BIGINT)), (CAST(3 AS BIGINT), CAST(30 AS BIGINT))")
    // flag: NULL for id=1, 1 for id=2, 0 for id=3 — SQL fires a clause
    // only on TRUE, so id=1 and id=3 must fall through to the UPDATE
    spark.sql(
      s"""MERGE INTO $c.n t
         |USING (SELECT CAST(id AS BIGINT) AS id, CAST(-1 AS BIGINT) AS v,
         |              CASE WHEN id = 1 THEN CAST(NULL AS INT)
         |                   WHEN id = 2 THEN 1 ELSE 0 END AS flag
         |       FROM range(1, 4)) s
         |ON t.id = s.id
         |WHEN MATCHED AND s.flag = 1 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    val out = spark.sql(s"SELECT id, v FROM $c.n ORDER BY id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> -1L, 3L -> -1L),
      s"id=2 deletes, ids 1 (NULL flag) and 3 (flag=0) must UPDATE: $out")
  }

  test("external LOCATION tables stay reachable; DROP leaves their data") {
    val c = freshCatalog()
    val loc = graft.io.Staging.tempDir("graft_ext_") + "/tbl"
    spark.sql(s"CREATE TABLE $c.ext (id BIGINT) USING `graft-delta` LOCATION '$loc'")
    spark.sql(s"INSERT INTO $c.ext SELECT CAST(id AS BIGINT) FROM range(7)")
    assert(spark.sql(s"SELECT count(*) FROM $c.ext").head.getLong(0) == 7)
    spark.sql(s"DROP TABLE $c.ext")
    // external contract: the identifier is gone, the data is not
    assert(spark.sql(s"SHOW TABLES IN $c").collect().isEmpty)
    assert(graft.io.DeltaRead.read(spark, loc).count() == 7)
    // and an existing external table can be re-registered
    spark.sql(s"CREATE TABLE $c.ext2 USING `graft-delta` LOCATION '$loc'")
    assert(spark.sql(s"SELECT count(*) FROM $c.ext2").head.getLong(0) == 7)
    // a DANGLING link (external data deleted out-of-band) must not
    // brick the identifier: DROP removes the link, re-CREATE works
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(loc))
    spark.sql(s"DROP TABLE $c.ext2")
    spark.sql(s"CREATE TABLE $c.ext2 (id BIGINT) USING `graft-delta`")
    assert(spark.sql(s"SELECT count(*) FROM $c.ext2").head.getLong(0) == 0)
  }

  test("CREATE TABLE TBLPROPERTIES: constraints route, obligation keys refuse pre-commit") {
    val c = freshCatalog()
    // a constraint property at creation is recorded via its dedicated
    // commit and ENFORCED on the first insert
    spark.sql(s"CREATE TABLE $c.cc (id BIGINT) USING `graft-delta` " +
      "TBLPROPERTIES ('delta.constraints.pos' = 'id > 0')")
    intercept[Exception] {
      spark.sql(s"INSERT INTO $c.cc VALUES (CAST(-1 AS BIGINT))")
    }
    spark.sql(s"INSERT INTO $c.cc VALUES (CAST(1 AS BIGINT))")
    // an obligation-bearing key refuses BEFORE any commit — no
    // half-created table left behind
    intercept[UnsupportedOperationException] {
      spark.sql(s"CREATE TABLE $c.cm (id BIGINT) USING `graft-delta` " +
        "TBLPROPERTIES ('delta.columnMapping.mode' = 'name')")
    }
    assert(!spark.sql(s"SHOW TABLES IN $c").collect()
      .map(_.getString(1)).contains("cm"), "half-created table left behind")
    spark.sql(s"CREATE TABLE $c.cm (id BIGINT) USING `graft-delta`") // now fine
  }

  test("namespace traversal is refused; constraints route through their API") {
    val c = freshCatalog()
    val wh = spark.conf.get(s"spark.sql.catalog.$c.warehouse")
    // a marker OUTSIDE the warehouse that a traversal would delete
    val marker = Paths.get(wh).getParent.resolve(s"marker_$c")
    Files.createDirectories(marker)
    intercept[Exception] { spark.sql(s"DROP NAMESPACE $c.`..` CASCADE") }
    assert(Files.isDirectory(marker), "traversal escaped the warehouse")
    // SET TBLPROPERTIES with a constraint key must validate existing
    // rows (addCheckConstraint), not record blindly
    spark.sql(s"CREATE TABLE $c.ct (id BIGINT) USING `graft-delta`")
    spark.sql(s"INSERT INTO $c.ct VALUES (CAST(-5 AS BIGINT)), (CAST(3 AS BIGINT))")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $c.ct SET TBLPROPERTIES " +
        "('delta.constraints.pos' = 'id > 0')")
    }
    spark.sql(s"ALTER TABLE $c.ct SET TBLPROPERTIES " +
      "('delta.constraints.sane' = 'id > -100')")
    // recorded AND enforced on the next write
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $c.ct VALUES (CAST(-200 AS BIGINT))")
    }
    assert(e.getMessage.contains("sane") || e.getMessage.contains("-100"))
    spark.sql(s"ALTER TABLE $c.ct UNSET TBLPROPERTIES ('delta.constraints.sane')")
    spark.sql(s"INSERT INTO $c.ct VALUES (CAST(-200 AS BIGINT))") // now fine
    // obligation keys refuse a raw properties edit
    intercept[UnsupportedOperationException] {
      spark.sql(s"ALTER TABLE $c.ct SET TBLPROPERTIES " +
        "('delta.columnMapping.mode' = 'name')")
    }
  }

  test("SQL schema evolution: ADD COLUMN null-fills, widening, mapped RENAME/DROP") {
    val c = freshCatalog()
    spark.sql(s"CREATE TABLE $c.se (id BIGINT, v INT) USING `graft-delta`")
    spark.sql(s"INSERT INTO $c.se VALUES (CAST(1 AS BIGINT), 10), (CAST(2 AS BIGINT), 20)")
    // ADD COLUMN is metaData-only: files predating it read as NULL
    val wh = spark.conf.get(s"spark.sql.catalog.$c.warehouse")
    val filesBefore = graft.io.DeltaRead.snapshot(spark, s"$wh/se").files.map(_.path).toSet
    spark.sql(s"ALTER TABLE $c.se ADD COLUMNS (tag STRING)")
    assert(graft.io.DeltaRead.snapshot(spark, s"$wh/se").files.map(_.path).toSet
      == filesBefore, "ADD COLUMN must not touch data files")
    spark.sql(s"INSERT INTO $c.se VALUES (CAST(3 AS BIGINT), 30, 'x')")
    val tags = spark.sql(s"SELECT tag FROM $c.se ORDER BY id").collect()
      .map(r => Option(r.getString(0))).toSeq
    assert(tags == Seq(None, None, Some("x")))
    // lossless widening, log-only
    spark.sql(s"ALTER TABLE $c.se ALTER COLUMN v TYPE BIGINT")
    assert(spark.sql(s"SELECT sum(v) AS s FROM $c.se").head.getLong(0) == 60L)
    // RENAME/DROP ride column mapping: register a mapped external table
    import spark.implicits._
    val ext = graft.io.Staging.tempDir("graft_se_ext")
    graft.io.DeltaWrite.createColumnMapped(
      Seq((1L, "a", 5L), (2L, "b", 6L)).toDF("k", "s", "old"), ext)
    spark.sql(s"CREATE TABLE $c.me (k BIGINT, s STRING, old BIGINT) " +
      s"USING `graft-delta` LOCATION '$ext'")
    val extBefore = graft.io.DeltaRead.snapshot(spark, ext).files.map(_.path).toSet
    spark.sql(s"ALTER TABLE $c.me RENAME COLUMN s TO label")
    spark.sql(s"ALTER TABLE $c.me DROP COLUMN old")
    assert(graft.io.DeltaRead.snapshot(spark, ext).files.map(_.path).toSet
      == extBefore, "mapped RENAME/DROP are one JSON line each, zero rewrites")
    val out = spark.sql(s"SELECT k, label FROM $c.me ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "a"), (2L, "b")))
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT: the SQL door reaches real enforcement") {
    val c = freshCatalog()
    spark.sql(s"CREATE TABLE $c.cc (id BIGINT, v BIGINT) USING `graft-delta`")
    spark.sql(s"INSERT INTO $c.cc VALUES (CAST(1 AS BIGINT), CAST(10 AS BIGINT))")
    spark.sql(s"ALTER TABLE $c.cc ADD CONSTRAINT pos CHECK (v > 0)")
    val wh = spark.conf.get(s"spark.sql.catalog.$c.warehouse")
    val s = graft.io.DeltaRead.snapshot(spark, s"$wh/cc")
    assert(s.configuration.get("delta.constraints.pos").exists(_.contains("v > 0")),
      s"constraint must land in the log config: ${s.configuration}")
    assert(s.writerFeatures.contains("checkConstraints") || s.minWriterVersion >= 3,
      "the ADD must ride the protocol-upgrading commit, not a raw property")
    // a violating INSERT refuses; the table stays at one row
    val e = intercept[Exception](spark.sql(
      s"INSERT INTO $c.cc VALUES (CAST(2 AS BIGINT), CAST(-5 AS BIGINT))"))
    assert(e.getMessage.contains("pos") || e.getMessage.toLowerCase.contains("check"),
      s"unexpected refusal: ${e.getMessage}")
    assert(spark.sql(s"SELECT count(*) FROM $c.cc").head.getLong(0) == 1)
    // a constraint EXISTING data violates refuses at ADD time
    val e2 = intercept[Exception](spark.sql(
      s"ALTER TABLE $c.cc ADD CONSTRAINT big CHECK (v > 100)"))
    assert(e2.getMessage.contains("big") ||
      e2.getMessage.toLowerCase.contains("violated"))
    // DROP re-opens the door; IF EXISTS tolerates absence, bare DROP refuses
    spark.sql(s"ALTER TABLE $c.cc DROP CONSTRAINT pos")
    spark.sql(s"INSERT INTO $c.cc VALUES (CAST(2 AS BIGINT), CAST(-5 AS BIGINT))")
    assert(spark.sql(s"SELECT count(*) FROM $c.cc").head.getLong(0) == 2)
    spark.sql(s"ALTER TABLE $c.cc DROP CONSTRAINT IF EXISTS nope")
    val e3 = intercept[Exception](
      spark.sql(s"ALTER TABLE $c.cc DROP CONSTRAINT nope"))
    assert(e3.getMessage.contains("nope"))
  }

  test("ADD COLUMN ... DEFAULT: one metadata commit, pre-add rows serve it, inserts fill it") {
    val c = freshCatalog()
    spark.sql(s"CREATE TABLE $c.cd (id BIGINT, s STRING) USING `graft-delta`")
    spark.sql(s"INSERT INTO $c.cd VALUES (CAST(1 AS BIGINT), 'a'), (CAST(2 AS BIGINT), 'b')")
    val wh = spark.conf.get(s"spark.sql.catalog.$c.warehouse")
    val filesBefore = graft.io.DeltaRead.snapshot(spark, s"$wh/cd").files.map(_.path).toSet
    val commitsBefore = operations(s"$wh/cd").size
    spark.sql(s"ALTER TABLE $c.cd ADD COLUMN score DOUBLE DEFAULT 2.5")
    val snap = graft.io.DeltaRead.snapshot(spark, s"$wh/cd")
    assert(snap.files.map(_.path).toSet == filesBefore,
      "a defaulted add is metadata-only — zero data files rewritten")
    assert(operations(s"$wh/cd").size == commitsBefore + 1,
      "ADD COLUMN DEFAULT must land as ONE commit (protocol included)")
    assert(snap.minWriterVersion == 7 &&
      snap.writerFeatures.contains("allowColumnDefaults"),
      s"the same commit must list allowColumnDefaults: ${snap.writerFeatures}")
    // pre-add rows serve the alter-time default, not null
    def scores(): Map[Long, Option[Double]] =
      spark.sql(s"SELECT id, score FROM $c.cd").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(scores() == Map(1L -> Some(2.5), 2L -> Some(2.5)), s"got ${scores()}")
    // an insert omitting the column evaluates CURRENT_DEFAULT; an
    // explicit NULL stays NULL (default ≠ not-null coercion)
    spark.sql(s"INSERT INTO $c.cd (id, s) VALUES (CAST(3 AS BIGINT), 'c')")
    spark.sql(s"INSERT INTO $c.cd VALUES (CAST(4 AS BIGINT), 'd', NULL)")
    assert(scores() == Map(1L -> Some(2.5), 2L -> Some(2.5),
      3L -> Some(2.5), 4L -> None), s"got ${scores()}")
    // SET DEFAULT changes only FUTURE inserts; DROP DEFAULT ends them;
    // rows that pre-date the column keep serving the ADD-time value
    spark.sql(s"ALTER TABLE $c.cd ALTER COLUMN score SET DEFAULT 7.5")
    spark.sql(s"INSERT INTO $c.cd (id, s) VALUES (CAST(5 AS BIGINT), 'e')")
    spark.sql(s"ALTER TABLE $c.cd ALTER COLUMN score DROP DEFAULT")
    spark.sql(s"INSERT INTO $c.cd (id, s) VALUES (CAST(6 AS BIGINT), 'f')")
    assert(scores() == Map(1L -> Some(2.5), 2L -> Some(2.5), 3L -> Some(2.5),
      4L -> None, 5L -> Some(7.5), 6L -> None), s"got ${scores()}")
    // a nested defaulted add refuses loudly (existence defaults are a
    // top-level reader contract)
    spark.sql(s"ALTER TABLE $c.cd ADD COLUMN meta STRUCT<a: BIGINT>")
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $c.cd ADD COLUMN meta.b BIGINT DEFAULT 9"))
    assert(e.getMessage.contains("top-level") || e.getMessage.contains("nested"),
      s"unexpected refusal shape: ${e.getMessage}")
  }

  test("SQL maintenance: OPTIMIZE / ZORDER / RESTORE / VACUUM") {
    val c = freshCatalog()
    spark.sql(s"CREATE TABLE $c.mt (id BIGINT, v BIGINT) USING `graft-delta`")
    (0 until 3).foreach(i => spark.sql(s"INSERT INTO $c.mt SELECT " +
      s"CAST(id + ${i * 10} AS BIGINT), CAST(id AS BIGINT) FROM range(10)"))
    val o = spark.sql(s"OPTIMIZE $c.mt").collect()
    assert(o.head.getInt(1) >= 1, "3 small files must bin-pack")
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.mt").head.getLong(0) == 30)
    val r = spark.sql(s"RESTORE TABLE $c.mt TO VERSION AS OF 1").collect()
    assert(r.head.getLong(1) == 1L)
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.mt").head.getLong(0) == 10,
      "restore must reinstate the version-1 row set")
    val vac = spark.sql(s"VACUUM $c.mt RETAIN 0 HOURS").collect()
    assert(vac.head.getInt(1) >= 1, "the restore orphaned rewrites to reclaim")
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.mt").head.getLong(0) == 10,
      "vacuum must never touch live files")
    // ZORDER declares clustering (one commit) and re-clusters
    spark.sql(s"INSERT INTO $c.mt SELECT CAST(id + 100 AS BIGINT), " +
      "CAST(id AS BIGINT) FROM range(10)")
    spark.sql(s"OPTIMIZE $c.mt ZORDER BY (id)")
    val wh = spark.conf.get(s"spark.sql.catalog.$c.warehouse")
    assert(graft.io.DeltaWrite.clusteringColumns(
      graft.io.DeltaRead.snapshot(spark, s"$wh/mt")) == Seq("id"))
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.mt").head.getLong(0) == 20)
    // ALTER TABLE ... CLUSTER BY re-declares the clustering columns
    spark.sql(s"ALTER TABLE $c.mt CLUSTER BY (v)")
    assert(graft.io.DeltaWrite.clusteringColumns(
      graft.io.DeltaRead.snapshot(spark, s"$wh/mt")) == Seq("v"))
    // DESCRIBE HISTORY: newest-first audit of surviving commits
    val hist = spark.sql(s"DESCRIBE HISTORY $c.mt").collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(hist.map(_._1).toSeq == hist.map(_._1).toSeq.sorted.reverse)
    assert(hist.head._2 == "CLUSTER BY")
    assert(hist.map(_._2).contains("RESTORE") && hist.map(_._2).contains("OPTIMIZE"))
    val hist2 = spark.sql(s"DESCRIBE HISTORY $c.mt LIMIT 2").collect()
    assert(hist2.length == 2)
    // DESCRIBE DETAIL: the one-row operator summary
    val det = spark.sql(s"DESCRIBE DETAIL $c.mt").head
    assert(det.getString(0) == "graft-delta")
    assert(det.getLong(3) >= 1 && det.getLong(4) > 0,
      "live file count and bytes must be positive")
    assert(det.getString(6) == "v", "clustering columns after ALTER CLUSTER BY")
    assert(det.getInt(8) >= 2, "min writer version")
    // non-maintenance statements pass through the injected parser
    assert(spark.sql("SELECT 1 AS one").head.getInt(0) == 1)
  }

  test("SQL maintenance: partition-scoped OPTIMIZE and VACUUM DRY RUN") {
    val c = freshCatalog()
    spark.sql(s"CREATE TABLE $c.pm (id BIGINT, p STRING) USING `graft-delta` " +
      "PARTITIONED BY (p)")
    (0 until 2).foreach(_ => spark.sql(s"INSERT INTO $c.pm SELECT " +
      "CAST(id AS BIGINT), CAST(id % 2 AS STRING) FROM range(20)"))
    val wh = spark.conf.get(s"spark.sql.catalog.$c.warehouse") + "/pm"
    def filesOf(p: String): Set[String] = graft.io.DeltaRead.snapshot(spark, wh)
      .files.filter(_.partitionValues.get("p").contains(p)).map(_.path).toSet
    val before0 = filesOf("0")
    assert(before0.size >= 2 && filesOf("1").size >= 2)
    // WHERE scopes the pass: p=1 compacts, p=0 keeps its exact bytes
    val opt = spark.sql(s"OPTIMIZE $c.pm WHERE p = '1'").collect()
    assert(opt.head.getInt(1) >= 1)
    assert(filesOf("0") == before0, "p=0 must not be listed into the rewrite")
    assert(filesOf("1").size == 1)
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.pm").head.getLong(0) == 40)
    // DRY RUN counts without deleting; the real run reclaims the same
    val dry = spark.sql(s"VACUUM $c.pm RETAIN 0 HOURS DRY RUN").collect()
    assert(dry.head.getInt(1) >= 1 && dry.head.getBoolean(2))
    val dry2 = spark.sql(s"VACUUM $c.pm RETAIN 0 HOURS DRY RUN").collect()
    assert(dry2.head.getInt(1) == dry.head.getInt(1), "dry run must not delete")
    val real = spark.sql(s"VACUUM $c.pm RETAIN 0 HOURS").collect()
    assert(real.head.getInt(1) == dry.head.getInt(1) && !real.head.getBoolean(2))
    assert(spark.sql(s"VACUUM $c.pm RETAIN 0 HOURS DRY RUN").collect()
      .head.getInt(1) == 0)
    assert(spark.sql(s"SELECT count(*) AS n FROM $c.pm").head.getLong(0) == 40)
    // a WHERE naming a non-partition column refuses loudly
    val e = intercept[Exception] { spark.sql(s"OPTIMIZE $c.pm WHERE id = 1") }
    assert(e.getMessage.contains("not a partition column"))
  }

  test("refusals: time travel DML, partial merge SET, schema changes") {
    val c = freshCatalog()
    spark.sql(s"CREATE TABLE $c.r (id BIGINT, v BIGINT) USING `graft-delta`")
    spark.sql(s"INSERT INTO $c.r VALUES (CAST(1 AS BIGINT), CAST(1 AS BIGINT))")
    val e1 = intercept[Exception] {
      spark.sql(s"DELETE FROM $c.r VERSION AS OF 0 WHERE id = 1")
    }
    assert(e1.getMessage != null)
    // partial SET is now a supported route (mergeAdvanced); a NON-EQUI
    // ON has no key contract in either path and must refuse
    val e2 = intercept[UnsupportedOperationException] {
      spark.sql(
        s"""MERGE INTO $c.r t
           |USING (SELECT CAST(1 AS BIGINT) AS id, CAST(9 AS BIGINT) AS v) s
           |ON t.id > s.id
           |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(e2.getMessage.contains("ON condition"))
    // NOT NULL adds have no value for existing rows; RENAME without
    // column mapping would mean rewriting every file — both refuse loudly
    val e3 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $c.r ADD COLUMNS (extra STRING NOT NULL)")
    }
    assert(e3.getMessage.contains("nullable"))
    val e4 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $c.r RENAME COLUMN v TO w")
    }
    assert(e4.getMessage.contains("column-mapped"))
  }

  test("ALTER TABLE ADD COLUMNS is atomic: one commit, all-or-nothing") {
    val c = freshCatalog()
    spark.sql(s"CREATE TABLE $c.at (id BIGINT) USING `graft-delta`")
    spark.sql(s"INSERT INTO $c.at VALUES (CAST(1 AS BIGINT))")
    val wh = spark.conf.get(s"spark.sql.catalog.$c.warehouse") + "/at"
    val vBefore = graft.io.DeltaRead.latestVersion(wh)
    // two adds = ONE metaData commit
    spark.sql(s"ALTER TABLE $c.at ADD COLUMNS (a INT, b INT)")
    assert(graft.io.DeltaRead.latestVersion(wh) == vBefore + 1,
      "ADD COLUMNS (a, b) must be one commit, not one per column")
    assert(spark.sql(s"SELECT id, a, b FROM $c.at").columns.toSeq
      == Seq("id", "a", "b"))
    // a statement with a later-invalid change commits NOTHING: c would
    // be addable but d is NOT NULL — validation precedes any commit
    val v2 = graft.io.DeltaRead.latestVersion(wh)
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $c.at ADD COLUMNS (c INT, d INT NOT NULL)")
    }
    assert(e.getMessage.contains("nullable"))
    assert(graft.io.DeltaRead.latestVersion(wh) == v2,
      "a refused ADD COLUMNS must leave zero commits behind")
    assert(!spark.sql(s"SELECT * FROM $c.at").columns.contains("c"),
      "column c must not exist after the refused statement")
    // naming one column twice in a statement refuses
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $c.at ADD COLUMNS (e INT, e STRING)")
    }
    assert(graft.io.DeltaRead.latestVersion(wh) == v2)
    // FIRST/AFTER place the column logically — still one metaData line
    spark.sql(s"ALTER TABLE $c.at ADD COLUMNS (z INT FIRST, y INT AFTER id)")
    assert(spark.sql(s"SELECT * FROM $c.at").columns.toSeq
      == Seq("z", "id", "y", "a", "b"),
      "FIRST/AFTER must order the schema")
    assert(graft.io.DeltaRead.latestVersion(wh) == v2 + 1)
    // AFTER naming a missing sibling refuses with zero commits
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $c.at ADD COLUMNS (w INT AFTER nope)")
    }
    assert(graft.io.DeltaRead.latestVersion(wh) == v2 + 1)
    // intra-statement references resolve: the AFTER sibling is added
    // by the SAME statement (validation folds a simulated schema)
    spark.sql(s"ALTER TABLE $c.at ADD COLUMNS (p INT, q INT AFTER p)")
    val cols = spark.sql(s"SELECT * FROM $c.at").columns.toSeq
    assert(cols.indexOf("q") == cols.indexOf("p") + 1,
      "q must land right after the p added by the same statement")
    assert(graft.io.DeltaRead.latestVersion(wh) == v2 + 2)
  }

  test("multi-DROP sequence effects refuse before any commit") {
    val c = freshCatalog()
    spark.sql(s"CREATE TABLE $c.sq (id BIGINT, " +
      "meta STRUCT<a: INT, b: INT>) USING `graft-delta`")
    import spark.implicits._
    val ext = graft.io.Staging.tempDir("graft_seq_map")
    graft.io.DeltaWrite.createColumnMapped(
      Seq((1L, (1, 2))).toDF("id", "m")
        .selectExpr("id", "named_struct('a', m._1, 'b', m._2) AS meta"), ext)
    spark.sql(s"CREATE TABLE $c.sm (id BIGINT, meta STRUCT<a: INT, b: INT>) " +
      s"USING `graft-delta` LOCATION '$ext'")
    val v0 = graft.io.DeltaRead.latestVersion(ext)
    // dropping BOTH fields would leave meta empty: the statement must
    // refuse on the SEQUENCE effect, with ZERO commits — not drop a
    // and then die on b
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $c.sm DROP COLUMNS (meta.a, meta.b)")
    }
    assert(e.getMessage.contains("last"))
    assert(graft.io.DeltaRead.latestVersion(ext) == v0,
      "a refused multi-DROP must leave zero commits behind")
    assert(spark.sql(s"SELECT meta.a FROM $c.sm").head.getInt(0) == 1)
  }

  test("ALTER TABLE ADD COLUMNS nested into struct: pre-add rows serve NULL") {
    val c = freshCatalog()
    spark.sql(s"CREATE TABLE $c.ns (id BIGINT, meta STRUCT<lang: STRING>) " +
      "USING `graft-delta`")
    spark.sql(s"INSERT INTO $c.ns VALUES (CAST(1 AS BIGINT), named_struct('lang', 'en'))")
    val wh = spark.conf.get(s"spark.sql.catalog.$c.warehouse") + "/ns"
    val filesBefore = graft.io.DeltaRead.snapshot(spark, wh).files.map(_.path).toSet
    spark.sql(s"ALTER TABLE $c.ns ADD COLUMNS (meta.quality DOUBLE)")
    assert(graft.io.DeltaRead.snapshot(spark, wh).files.map(_.path).toSet
      == filesBefore, "a nested ADD is one JSON line, zero data files")
    // the pre-add row serves the nested field as NULL
    val r0 = spark.sql(s"SELECT meta.quality FROM $c.ns WHERE id = 1").head
    assert(r0.isNullAt(0))
    spark.sql(s"INSERT INTO $c.ns VALUES (CAST(2 AS BIGINT), " +
      "named_struct('lang', 'fr', 'quality', CAST(0.9 AS DOUBLE)))")
    val r1 = spark.sql(s"SELECT meta.quality FROM $c.ns WHERE id = 2").head
    assert(r1.getDouble(0) == 0.9)
    // a nested path through a non-struct refuses
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $c.ns ADD COLUMNS (id.sub INT)")
    }
    assert(e.getMessage.contains("not a struct"))
  }

  test("ALTER COLUMN COMMENT and SET/DROP NOT NULL: metaData-only, data-validated") {
    val c = freshCatalog()
    spark.sql(s"CREATE TABLE $c.nn (id BIGINT, v BIGINT) USING `graft-delta`")
    spark.sql(s"INSERT INTO $c.nn VALUES (CAST(1 AS BIGINT), CAST(10 AS BIGINT)), " +
      "(CAST(2 AS BIGINT), NULL)")
    val wh = spark.conf.get(s"spark.sql.catalog.$c.warehouse") + "/nn"
    // COMMENT is one metaData line
    spark.sql(s"ALTER TABLE $c.nn ALTER COLUMN v COMMENT 'cents'")
    val committed = graft.io.DeltaRead.snapshot(spark, wh).schema.get
    assert(committed("v").metadata.getString("comment") == "cents")
    // SET NOT NULL on a column with NULL rows refuses — recording it
    // would be a lie readers trust
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $c.nn ALTER COLUMN v SET NOT NULL")
    }
    assert(e.getMessage.contains("IS NULL"))
    // clean the data, tighten, and the contract is then WRITE-ENFORCED
    spark.sql(s"DELETE FROM $c.nn WHERE v IS NULL")
    spark.sql(s"ALTER TABLE $c.nn ALTER COLUMN v SET NOT NULL")
    assert(!graft.io.DeltaRead.snapshot(spark, wh).schema.get("v").nullable)
    val e2 = intercept[Exception] {
      spark.sql(s"INSERT INTO $c.nn VALUES (CAST(3 AS BIGINT), NULL)")
    }
    assert(e2.getMessage != null)
    assert(spark.sql(s"SELECT count(*) FROM $c.nn").head.getLong(0) == 1)
    // DROP NOT NULL relaxes; the same insert then lands
    spark.sql(s"ALTER TABLE $c.nn ALTER COLUMN v DROP NOT NULL")
    spark.sql(s"INSERT INTO $c.nn VALUES (CAST(3 AS BIGINT), NULL)")
    assert(spark.sql(s"SELECT count(*) FROM $c.nn").head.getLong(0) == 2)
  }

  test("nested RENAME/DROP on a mapped table: metaData-only, values survive") {
    val c = freshCatalog()
    import spark.implicits._
    val ext = graft.io.Staging.tempDir("graft_nested_map")
    graft.io.DeltaWrite.createColumnMapped(
      Seq((1L, ("en", 5L)), (2L, ("fr", 6L))).toDF("id", "meta")
        .selectExpr("id", "named_struct('lang', meta._1, 'old', meta._2) AS meta"),
      ext)
    spark.sql(s"CREATE TABLE $c.nm (id BIGINT, " +
      "meta STRUCT<lang: STRING, old: BIGINT>) " +
      s"USING `graft-delta` LOCATION '$ext'")
    val filesBefore = graft.io.DeltaRead.snapshot(spark, ext).files.map(_.path).toSet
    spark.sql(s"ALTER TABLE $c.nm RENAME COLUMN meta.lang TO language")
    spark.sql(s"ALTER TABLE $c.nm DROP COLUMN meta.old")
    assert(graft.io.DeltaRead.snapshot(spark, ext).files.map(_.path).toSet
      == filesBefore, "nested RENAME/DROP are one JSON line each, zero rewrites")
    val out = spark.sql(s"SELECT id, meta.language FROM $c.nm ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "en"), (2L, "fr")),
      "renamed nested field must keep serving the stored values")
    assert(!spark.sql(s"SELECT meta.* FROM $c.nm").columns.contains("old"))
    // a struct may not lose its last field
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $c.nm DROP COLUMN meta.language")
    }
    assert(e.getMessage.contains("last"))
  }

  test("MERGE WITH SCHEMA EVOLUTION: source's new column lands via one ADD commit") {
    val c = freshCatalog()
    spark.sql(s"CREATE TABLE $c.ev (id BIGINT, v BIGINT) USING `graft-delta`")
    spark.sql(s"INSERT INTO $c.ev VALUES (CAST(1 AS BIGINT), CAST(10 AS BIGINT)), " +
      "(CAST(2 AS BIGINT), CAST(20 AS BIGINT))")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $c.ev t
         |USING (SELECT CAST(2 AS BIGINT) AS id, CAST(99 AS BIGINT) AS v,
         |              'fresh' AS tag
         |        UNION ALL
         |       SELECT CAST(3 AS BIGINT), CAST(30 AS BIGINT), 'new') s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = spark.sql(s"SELECT id, v, tag FROM $c.ev ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSeq
    assert(out == Seq((1L, 10L, None), (2L, 99L, Some("fresh")),
      (3L, 30L, Some("new"))),
      s"evolved merge state wrong: ${out.mkString(",")}")
    // the commit trail: the evolution is ONE metaData ADD commit, then
    // the merge — auditable, exactly the two-statement form would leave
    val wh = spark.conf.get(s"spark.sql.catalog.$c.warehouse") + "/ev"
    val ops = operations(wh)
    val addIdx = ops.indexWhere(_.startsWith("ADD COLUMN"))
    assert(addIdx >= 0, s"no ADD COLUMN commit in ${ops.mkString(",")}")
    assert(ops.count(_.startsWith("ADD COLUMN")) == 1,
      "schema evolution must be one metaData commit")
    assert(ops.drop(addIdx + 1).exists(_.startsWith("MERGE")),
      s"merge must follow the evolution commit: ${ops.mkString(",")}")
  }

  test("RESTORE TO TIMESTAMP AS OF resolves through the same parser as reads") {
    val c = freshCatalog()
    spark.sql(s"CREATE TABLE $c.rt (id BIGINT) USING `graft-delta`")
    spark.sql(s"INSERT INTO $c.rt VALUES (1), (2)")
    Thread.sleep(20)
    val t1 = System.currentTimeMillis()
    Thread.sleep(20)
    spark.sql(s"INSERT INTO $c.rt VALUES (3), (4), (5)")
    val r = spark.sql(s"RESTORE TABLE $c.rt TO TIMESTAMP AS OF '$t1'")
      .collect().head
    assert(r.getLong(1) == 1L, "t1 sits between the inserts -> version 1")
    assert(spark.sql(s"SELECT count(*) FROM $c.rt").head.getLong(0) == 2)
    spark.sql(s"DROP TABLE $c.rt")
  }
}

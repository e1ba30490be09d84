package graft

class GraftFunctionsSpec extends SparkSpec {

  test("graft functions are callable from SQL and match the Column API") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_phash('0:0') AS h,
        |  graft_bor_encode('click', 2024) AS enc,
        |  graft_bor_year(graft_bor_encode('click', 2024)) AS yr,
        |  graft_bor(graft_bor_encode('click', 2024)) AS bor,
        |  graft_salted('1:212', 10) AS sk,
        |  graft_vec_dot(array(cast(1.0 as float), cast(2.0 as float)),
        |                array(cast(3.0 as float), cast(4.0 as float))) AS dot
        |""".stripMargin).collect().head
    assert(r.getLong(0) >= 0 && r.getLong(0) < (1L << 32))
    assert(r.getInt(1) == 202401)
    assert(r.getInt(2) == 2024)
    assert(r.getString(3) == "click")
    assert(r.getString(4).matches("\\d:1:212"))
    assert(r.getDouble(5) == 11.0)

    // SQL functions must agree exactly with the Column API
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val c = Seq(("0:0", "1:212")).toDF("a", "b")
      .select(graft.expr.PortableHash.phash(col("a")).as("h"),
        graft.expr.Salt.salted(col("b"), 10).as("sk"))
      .collect().head
    assert(r.getLong(0) == c.getLong(0), "graft_phash == PortableHash.phash")
    assert(r.getString(4) == c.getString(1), "graft_salted == Salt.salted")
  }

  test("SQL functions survive whole-stage codegen over a real table") {
    GraftFunctions.register(spark)
    Tables.documents(spark, "/root/testdata/sf0.001").createOrReplaceTempView("docs_v")
    val n = spark.sql(
      "SELECT count(DISTINCT graft_phash(text)) AS n FROM docs_v")
      .collect().head.getLong(0)
    assert(n > 400, "distinct hashes across 500 docs")
  }

  test("graft_lsh_cell from SQL == Similarity.cellId (quantizer band)") {
    import org.apache.spark.sql.functions.col
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    emb.createOrReplaceTempView("emb_v")
    import graft.llm.Similarity
    val viaSql = spark.sql(
      s"SELECT vec_id, graft_lsh_cell(embedding, ${Similarity.QuantizerBand}, " +
        s"${Similarity.QuantizerBits}, ${Similarity.Dim}) AS cell FROM emb_v")
    val viaCol = emb.select(col("vec_id"),
      Similarity.cellId(col("embedding"), Similarity.QuantizerBand,
        Similarity.QuantizerBits, Similarity.Dim).as("cell"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty,
      "SQL cell ids match the Column API bitwise")
    assert(viaCol.select("cell").distinct().count() > 1, "cells actually partition the space")
  }

  test("graft_redact_pii / graft_sample_keep == Scrub Column API") {
    import org.apache.spark.sql.functions.col
    import graft.llm.Scrub
    GraftFunctions.register(spark)
    val red = spark.sql(
      "SELECT graft_redact_pii('write a.b@c.org or +1-555-0000 now') AS r")
      .collect().head.getString(0)
    assert(red == "write <EMAIL> or <PHONE> now")

    Tables.documents(spark, "/root/testdata/sf0.001").createOrReplaceTempView("docs_s")
    val viaSql = spark.sql(
      "SELECT doc_id FROM docs_s WHERE graft_sample_keep(doc_id, 250000, 'seed-x')")
    val viaCol = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(Scrub.stratifiedKeep(col("doc_id"), col("lang"), Nil, 250000L, "seed-x"))
      .select("doc_id")
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty,
      "SQL sample filter == stratifiedKeep with a flat rate")
  }

  test("graft_nfc / graft_zorder == expression and Column APIs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    GraftFunctions.register(spark)
    val nfc = spark.sql("SELECT graft_nfc('cafe\u0301') AS n").collect().head.getString(0)
    assert(nfc == "caf\u00e9", "SQL NFC composes the combining acute")

    val rnd = new scala.util.Random(29)
    val pts = Seq.fill(100)((rnd.nextInt(65536), rnd.nextInt(65536)))
    pts.toDF("x", "y").createOrReplaceTempView("zpts")
    val viaSql = spark.sql("SELECT graft_zorder(x, y) AS z FROM zpts")
    val viaCol = pts.toDF("x", "y")
      .select(graft.ops.ZOrder.interleave(col("x"), col("y")).as("z"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty,
      "SQL morton code matches the Column API bitwise")
  }
}

package graft.merge

import org.apache.spark.sql.types._

import graft.GraftSuite

/** Golden test for the debug render (B11) against the reference's worked
  * VendorList example (README.md:51-101): same schema (1-key / 7-payload),
  * same clause structure in the rendered statement, and the audit DDL
  * shape of sp_SimpleMerge.sql:432-462.
  */
class MergeDebugSpec extends GraftSuite {

  private val vendorSchema = StructType(Seq(
    StructField("Vendor", IntegerType, nullable = false),
    StructField("Name", StringType),
    StructField("Addr", StringType),
    StructField("Addr2", StringType),
    StructField("City", StringType),
    StructField("State", StringType),
    StructField("Zip", StringType),
    StructField("Phone", StringType)))

  private def render(opts: MergeOptions): String =
    MergeDebug.renderSql(
      MergePlan.build(vendorSchema, vendorSchema, opts), "MyDB.dbo.VendorList", "SourceDB.dbo.VendorList")

  test("golden: VendorList render reproduces the README clause structure") {
    val sql = render(MergeOptions(keys = Seq("Vendor")))
    val lines = sql.linesIterator.toSeq

    // MERGE INTO t USING s (README.md:61-62)
    assert(lines.head === "MERGE INTO MyDB.dbo.VendorList AS t")
    assert(lines(1) === "USING SourceDB.dbo.VendorList AS s")
    // ON clause: non-nullable key renders plain equality (README.md:63)
    assert(lines(2) === "ON t.`Vendor` = s.`Vendor`")
    // Change detection: the INTERSECT NOT-EXISTS becomes struct IS DISTINCT
    // FROM, with payload columns in source order (README.md:64-68)
    val payload = Seq("Name", "Addr", "Addr2", "City", "State", "Zip", "Phone")
    val sStruct = payload.map(c => s"s.`$c`").mkString("struct(", ", ", ")")
    val tStruct = payload.map(c => s"t.`$c`").mkString("struct(", ", ", ")")
    assert(sql.contains(s"WHEN MATCHED AND $sStruct IS DISTINCT FROM $tStruct THEN UPDATE SET"))
    // UPDATE SET: every payload column, in order (README.md:69-76)
    val updates = payload.map(c => s"  t.`$c` = s.`$c`")
    assert(updates.forall(sql.contains))
    assert(payload.sliding(2).forall { case Seq(a, b) =>
      sql.indexOf(s"t.`$a` = s.`$a`") < sql.indexOf(s"t.`$b` = s.`$b`") })
    // INSERT list: all source columns in sourceId order (README.md:77-97)
    val insertCols = ("Vendor" +: payload).map(c => s"`$c`").mkString(", ")
    val insertVals = ("Vendor" +: payload).map(c => s"s.`$c`").mkString(", ")
    assert(sql.contains(s"WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)"))
    // Default delete clause (README.md:98-99)
    assert(sql.contains("WHEN NOT MATCHED BY SOURCE THEN DELETE"))
  }

  test("golden: soft delete and keep variants render the right NMBS clause") {
    val soft = render(MergeOptions(keys = Seq("Vendor"), delete = DeleteMode.parse("set Name = 'gone'")))
    assert(soft.contains("WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.`Name` = 'gone'"))
    val keep = render(MergeOptions(keys = Seq("Vendor"), delete = DeleteMode.parse("NO")))
    assert(!keep.contains("NOT MATCHED BY SOURCE"))
  }

  test("golden: nullable keys render null-safe ON; badKey appends rn tiebreak") {
    val nullableSchema = StructType(vendorSchema.fields.map(_.copy(nullable = true)))
    val plan = MergePlan.build(nullableSchema, nullableSchema,
      MergeOptions(keys = Seq("Vendor"), badKey = true))
    val sql = MergeDebug.renderSql(plan, "T", "S")
    assert(sql.contains("t.`Vendor` <=> s.`Vendor`"))
    assert(sql.contains("AND t._SimpleMerge_rn = s._SimpleMerge_rn"))
    assert(sql.contains("row_number() OVER (PARTITION BY `Vendor`"))
  }

  test("audit DDL: actionTime/action/keys then d_* block then i_* block (sql:432-462)") {
    val plan = MergePlan.build(vendorSchema, vendorSchema, MergeOptions(keys = Seq("Vendor")))
    val schema = MergeDebug.auditSchema(plan)
    val names = schema.fieldNames.toSeq
    val payload = Seq("Name", "Addr", "Addr2", "City", "State", "Zip", "Phone")
    assert(names === Seq("actionTime", "action", "Vendor")
      ++ payload.map("d_" + _) ++ payload.map("i_" + _))
    // Images are nullable even though the base columns may not be.
    assert(schema.fields.filter(_.name.startsWith("d_")).forall(_.nullable))
    val ddl = MergeDebug.auditDdl(plan, "VendorList_SimpleMergeOutput")
    assert(ddl.startsWith("CREATE TABLE VendorList_SimpleMergeOutput (actionTime TIMESTAMP NOT NULL,action STRING NOT NULL,"))
  }

  test("joinColumns csv split (B1): trimmed, bracket-quoted, ordinal order") {
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      Seq.empty[Row].asJava, StructType(vendorSchema.fields.toSeq))
    val m = SimpleMerge.into(df).using(df).joinColumns(" [Vendor] , Name ,")
    assert(m.plan.keyCols.map(_.name) === Seq("Vendor", "Name"))
    assert(m.plan.keyCols.map(_.joinOrdinal.get) === Seq(0, 1))
  }

  test("all-key schema: no matched clause, no images (A12/A18)") {
    val keyOnly = StructType(vendorSchema.fields.take(1))
    val plan = MergePlan.build(keyOnly, keyOnly, MergeOptions(keys = Seq("Vendor")))
    assert(!MergeDebug.renderSql(plan, "T", "S").contains("WHEN MATCHED"))
    assert(MergeDebug.auditSchema(plan).fieldNames.toSeq === Seq("actionTime", "action", "Vendor"))
  }
}

package graft.sources

import graft.SparkSpec

/** JSON-lines source (file form of the reference's row-dict records). */
class JsonSourceSpec extends SparkSpec {

  test("json lines round-trip with explicit and inferred schemas") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-json")
    val file = tmp.resolve("rows.jsonl")
    java.nio.file.Files.writeString(file,
      """{"name":"Alice","age":25,"city":"New York"}
        |{"name":"Bob","age":35,"city":"Los Angeles"}
        |{"name":"Cara","age":41}
        |""".stripMargin)

    val inferred = Sources.jsonLines(spark, file.toString)
    assert(inferred.count() == 3)
    assert(inferred.columns.sorted.toSeq == Seq("age", "city", "name"))

    val typed = Sources.jsonLines(spark, file.toString,
      Some("name string, age long, city string"))
    assert(typed.schema("age").dataType.typeName == "long")
    // missing field → null, and the NL pipeline runs on top unchanged
    val out = graft.Engine.run("Filter rows where age > 30 and select columns name and age.", typed)
    assert(out.collect().map(_.getString(0)).toSet == Set("Bob", "Cara"))
  }
}

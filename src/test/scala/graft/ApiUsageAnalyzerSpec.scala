package graft

import java.nio.file.{Files, Paths}
import java.util.jar.{JarEntry, JarOutputStream}

import graft.tools.ApiUsageAnalyzer
import org.scalatest.funsuite.AnyFunSuite

/** The analyzer is pure bytecode inspection — no Spark session needed.
  * It dogfoods on this library's OWN compiled classes: the engine uses
  * the Spark SQL surface heavily, so analyzing graft's classes dir must
  * surface Dataset/functions usage, the same way the reference tool
  * surfaces kafka-streams usage from an application jar. */
class ApiUsageAnalyzerSpec extends AnyFunSuite {

  private val classesDir =
    Paths.get(SparkEntry.getClass.getProtectionDomain.getCodeSource.getLocation.toURI).toString

  test("descriptor argument parsing: objects, primitives, arrays") {
    assert(ApiUsageAnalyzer.argTypes("(Lorg/apache/spark/sql/Column;I[J)V") ==
      Seq("Column", "int", "long[]"))
    assert(ApiUsageAnalyzer.argTypes("()Lorg/apache/spark/sql/Dataset;") == Seq.empty)
    assert(ApiUsageAnalyzer.argTypes("([[Ljava/lang/String;D)J") == Seq("String[][]", "double"))
  }

  test("classes-dir scan reports the Spark SQL surface this engine uses") {
    val usage = ApiUsageAnalyzer.analyze(classesDir, Seq("org/apache/spark/sql"))
    val dataset = usage.getOrElse("org/apache/spark/sql/Dataset", Nil)
    assert(dataset.exists(_.startsWith("groupBy(")), s"no Dataset.groupBy in: $dataset")
    assert(dataset.exists(_.startsWith("join(")), s"no Dataset.join in: $dataset")
    // the functions object is the engine's main expression surface
    assert(usage.keys.exists(_.startsWith("org/apache/spark/sql/functions")),
      s"no sql.functions usage found in ${usage.keys.toSeq.sorted.take(10)}")
  }

  test("graft-prefix scan reports the engine's own DSL entry points") {
    val usage = ApiUsageAnalyzer.analyze(classesDir, Seq("graft/"))
    // Tables is the fixture-loading seam every query goes through
    val tables = usage.getOrElse("graft/Tables$", Nil)
    assert(tables.exists(_.startsWith("events(")), s"no Tables.events in: $tables")
  }

  test("jar scan finds the same references as the loose class files") {
    val jarPath = Files.createTempFile("graft-analyze", ".jar")
    val out = new JarOutputStream(Files.newOutputStream(jarPath))
    try {
      // pack a couple of real compiled classes
      for (rel <- Seq("graft/operators/Relational$.class", "graft/operators/Dedup$.class")) {
        out.putNextEntry(new JarEntry(rel))
        out.write(Files.readAllBytes(Paths.get(classesDir, rel)))
        out.closeEntry()
      }
    } finally out.close()
    val usage = ApiUsageAnalyzer.analyze(jarPath.toString, Seq("org/apache/spark/sql"))
    val dataset = usage.getOrElse("org/apache/spark/sql/Dataset", Nil)
    assert(dataset.exists(_.startsWith("groupBy(")), s"jar scan missed Dataset.groupBy: $dataset")
    Files.delete(jarPath)
  }
}

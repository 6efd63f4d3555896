package graft.tools

import java.io.{ByteArrayInputStream, DataInputStream, File}
import java.nio.file.Files
import java.util.jar.JarFile

import scala.collection.mutable

/** API-usage analyzer — the migration-assessment tool of the reference
  * (tools/src/main/java/dev/responsive/tools/StreamsBytecodeAnalyzer.java,
  * tools/README.md: scan an application jar, list every
  * org.apache.kafka.streams method it references, so compatibility can
  * be judged before running anything). Same job here for a Spark/graft
  * application: scan a jar or a compiled-classes directory and report
  * every referenced method on `graft/`* and the Spark SQL surface,
  * grouped `owner -> [method(argTypes)]` exactly like the reference's
  * output format.
  *
  * The reference leans on ASM; this sandbox has no bytecode library on
  * the compile classpath, and none is needed — method references live
  * in the class-file CONSTANT POOL (JVMS §4.4: CONSTANT_Methodref
  * entries joining a CONSTANT_Class to a CONSTANT_NameAndType), so a
  * ~60-line pool reader extracts them without touching code attributes.
  *
  * Run: sbt "runMain graft.tools.ApiUsageAnalyzer <jar-or-classes-dir> [ownerPrefix ...]"
  * (default prefixes: graft/, org/apache/spark/sql)
  */
object ApiUsageAnalyzer {

  final case class MethodRef(owner: String, name: String, desc: String) {
    /** `join(Dataset, Column, String)` — simple arg type names, like the
      * reference's FilterMethodCollector output. */
    def pretty: String = s"$name(${argTypes(desc).mkString(", ")})"
  }

  /** Parse a method descriptor's argument list into simple type names. */
  private[graft] def argTypes(desc: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = desc.indexOf('(') + 1
    var dims = 0
    while (i < desc.length && desc(i) != ')') {
      desc(i) match {
        case '[' => dims += 1; i += 1
        case 'L' =>
          val end = desc.indexOf(';', i)
          val fqcn = desc.substring(i + 1, end)
          out += fqcn.substring(fqcn.lastIndexOf('/') + 1) + "[]" * dims
          dims = 0; i = end + 1
        case c =>
          val prim = c match {
            case 'B' => "byte"; case 'C' => "char"; case 'D' => "double"
            case 'F' => "float"; case 'I' => "int"; case 'J' => "long"
            case 'S' => "short"; case 'Z' => "boolean"; case other => other.toString
          }
          out += prim + "[]" * dims
          dims = 0; i += 1
      }
    }
    out.toSeq
  }

  /** Every Methodref/InterfaceMethodref in one class file's constant
    * pool (JVMS §4.4 layout; long/double entries occupy two slots). */
  def methodRefs(classBytes: Array[Byte]): Seq[MethodRef] = {
    val in = new DataInputStream(new ByteArrayInputStream(classBytes))
    require(in.readInt() == 0xCAFEBABE, "not a class file")
    in.readInt() // minor + major version
    val count = in.readUnsignedShort()
    val utf8 = mutable.Map.empty[Int, String]
    val classNameIdx = mutable.Map.empty[Int, Int]
    val natIdx = mutable.Map.empty[Int, (Int, Int)]
    val refs = mutable.ArrayBuffer.empty[(Int, Int)] // (classIdx, natIdx)
    var i = 1
    while (i < count) {
      in.readUnsignedByte() match {
        case 1 => // Utf8
          val len = in.readUnsignedShort()
          val bytes = new Array[Byte](len); in.readFully(bytes)
          utf8(i) = new String(bytes, "UTF-8")
        case 3 | 4 => in.readInt() // Integer / Float
        case 5 | 6 => in.readLong(); i += 1 // Long / Double take two slots
        case 7 => classNameIdx(i) = in.readUnsignedShort()
        case 8 | 16 | 19 | 20 => in.readUnsignedShort() // String/MethodType/Module/Package
        case 9 => in.readInt() // Fieldref — not a method use
        case 10 | 11 => refs += ((in.readUnsignedShort(), in.readUnsignedShort()))
        case 12 => natIdx(i) = (in.readUnsignedShort(), in.readUnsignedShort())
        case 15 => in.readUnsignedByte(); in.readUnsignedShort() // MethodHandle
        case 17 | 18 => in.readInt() // Dynamic / InvokeDynamic
        case other => throw new IllegalArgumentException(s"unknown constant tag $other")
      }
      i += 1
    }
    refs.toSeq.flatMap { case (ci, ni) =>
      for {
        cn <- classNameIdx.get(ci).flatMap(utf8.get)
        (nameI, descI) <- natIdx.get(ni)
        name <- utf8.get(nameI)
        desc <- utf8.get(descI)
      } yield MethodRef(cn, name, desc)
    }
  }

  /** Scan a jar or classes directory; return owner → sorted distinct
    * pretty method signatures, for owners matching any prefix. */
  def analyze(path: String, ownerPrefixes: Seq[String]): Map[String, Seq[String]] = {
    def matches(owner: String) = ownerPrefixes.exists(owner.startsWith)
    val classFiles: Iterator[Array[Byte]] = {
      val f = new File(path)
      if (f.isDirectory) {
        def walk(d: File): Iterator[File] =
          d.listFiles.iterator.flatMap(c => if (c.isDirectory) walk(c) else Iterator(c))
        walk(f).filter(_.getName.endsWith(".class")).map(c => Files.readAllBytes(c.toPath))
      } else {
        val jar = new JarFile(f)
        import scala.jdk.CollectionConverters._
        jar.entries().asScala.filter(_.getName.endsWith(".class")).map { e =>
          val in = jar.getInputStream(e)
          try in.readAllBytes() finally in.close()
        }
      }
    }
    classFiles
      .flatMap(methodRefs)
      // lambda-lifted $anonfun$ forwarders are scalac plumbing, not API
      .filter(r => matches(r.owner) && !r.name.startsWith("$anonfun$"))
      .toSeq.distinct
      .groupBy(_.owner)
      .view.mapValues(_.map(_.pretty).distinct.sorted).toMap
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ApiUsageAnalyzer <jar-or-classes-dir> [ownerPrefix ...]")
    val prefixes =
      if (args.length > 1) args.drop(1).toSeq else Seq("graft/", "org/apache/spark/sql")
    for ((owner, methods) <- analyze(args(0), prefixes).toSeq.sortBy(_._1))
      println(s"$owner -> [${methods.mkString(", ")}]")
  }
}

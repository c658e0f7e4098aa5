package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

/** Refactoring guard for the oracle SQL surface: dumps every pinned
  * oracle string (LLM + graph + ml + relational — everything the driver
  * replays in DuckDB) as `name -> sha256(text)`, one line each, sorted.
  * Run before and after extracting a pinned string into a parameterized
  * builder and diff the two dumps: byte-identity at the pinned defaults
  * proves the refactor cannot have moved any oracle's semantics.
  *
  * Usage: sbt "Test/runMain graft.tools.OracleDump /tmp/oracles.txt"
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracles.txt")
    val md = MessageDigest.getInstance("SHA-256")
    def sha(s: String): String =
      md.digest(s.getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    val lines = graft.SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k ${sha(v)}" }
    Files.write(Paths.get(out),
      (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    println(s"[oracle-dump] ${lines.size} oracles -> $out")
  }
}

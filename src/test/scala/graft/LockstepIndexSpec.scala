package graft

import org.scalatest.funsuite.AnyFunSuite

/** LOCKSTEP.md anchor freshness (VERDICT r18 item 7): the lockstep
  * index is load-bearing for every future edit — each row names the
  * single-source generators/vals/memos of a family that must move
  * together. A rename that orphans an anchor would silently detach the
  * index from the code it points at. This spec greps every backticked
  * code anchor in LOCKSTEP.md against the source tree and fails when
  * one no longer resolves, so the index gets updated in the SAME
  * commit as the rename.
  *
  * Resolution rules (grep-level by design — the index is prose, not a
  * symbol table): an anchor with a `<placeholder>` or operator glyphs
  * is skipped; `pkg/File` anchors must exist as
  * src/main/scala/graft/pkg/File.scala; identifier-ish anchors
  * (optionally dotted, optionally with an argument list) must appear —
  * full string or last dotted segment — somewhere in src/. */
class LockstepIndexSpec extends AnyFunSuite {

  private def walk(f: java.io.File): Seq[java.io.File] =
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
    else if (f.getName.endsWith(".scala")) Seq(f)
    else Seq.empty

  test("every backticked code anchor in LOCKSTEP.md resolves in src/") {
    val md = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("LOCKSTEP.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val src = walk(new java.io.File("src")).map(f =>
      new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)).mkString("\n")
    val anchors = "`([^`]+)`".r.findAllMatchIn(md).map(_.group(1)).toSeq
    assert(anchors.size >= 40,
      s"LOCKSTEP.md anchor extraction collapsed (${anchors.size} found) — " +
      "the spec's regex no longer matches the file's format")
    val identLike = "^([A-Za-z][A-Za-z0-9_.]*)(\\(.*\\))?$".r
    val pathLike =
      "^(ext|ops|streaming|functions|plans|sources|tools)/([A-Za-z]+)$".r
    val missing = anchors.flatMap { a =>
      if (a.contains("<") || a.contains("·")) None // placeholders/math
      else a match {
        case identLike(name, _) =>
          val last = name.split('.').last
          if (src.contains(name) || src.contains(last)) None
          else Some(a)
        case pathLike(pkg, file) =>
          if (new java.io.File(s"src/main/scala/graft/$pkg/$file.scala")
                .exists()) None
          else Some(a)
        case _ => None // prose fragments (e.g. bare operators) — not anchors
      }
    }
    assert(missing.isEmpty,
      s"LOCKSTEP.md anchors no longer resolve in src/: ${missing.mkString(", ")} " +
      "— a rename must update the lockstep index in the same commit")
  }
}

package graft

import java.nio.file.{Files, Path, Paths}

/** Per-JVM staging directories for derived-table scaffolding (ORC/JSONL/
  * binary-file/compacted copies of the fixture tables). Same ownership
  * discipline as the streaming staged event log: everything lives under
  * `<root>/jvm-<pid>/`, and each call first purges `jvm-*` dirs whose
  * owning process is gone — so repeated bench/verify/dev sessions cannot
  * accumulate orphans (the binaryFile staging alone writes one file per
  * document; left in a shared temp dir that class of leak is measured in
  * inodes, not megabytes). The root lives under `target/` so a clean
  * build also reclaims everything. */
object StageDirs {
  private def root: Path = Files.createDirectories(Paths.get(sys.props.getOrElse(
    "graft.stage.tmp", "/root/repo/target/stage-tmp")))

  /** Fresh `<root>/jvm-<pid>/<prefix>…` dir; purges dead owners first. */
  def fresh(prefix: String): Path = {
    val r = root
    val myPid = ProcessHandle.current().pid()
    try {
      Files.list(r).forEach { p =>
        val name = p.getFileName.toString
        val ownerGone = name.startsWith("jvm-") &&
          name.stripPrefix("jvm-").toLongOption.exists(pid =>
            pid != myPid && !Files.isDirectory(Paths.get(s"/proc/$pid")))
        if (Files.isDirectory(p) && ownerGone) {
          def rm(q: Path): Unit = {
            if (Files.isDirectory(q)) Files.list(q).forEach(rm(_))
            Files.deleteIfExists(q)
          }
          try rm(p) catch { case _: Throwable => () }
        }
      }
    } catch { case _: Throwable => () }
    val mine = Files.createDirectories(r.resolve(s"jvm-$myPid"))
    Files.createTempDirectory(mine, prefix)
  }
}

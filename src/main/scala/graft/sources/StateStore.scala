package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** M9 — per-program durable state (the reference's `automation_state`
  * table: one small state value per program name, read at startup,
  * written after each work unit — `automation_base.R:68-93`,
  * `ViollierMetadataReceiver.java:73-90`).
  *
  * File-based here: one file per program under a state dir, written
  * atomically (temp file + move) so a crashed job never leaves a torn
  * state. State payloads are opaque strings (the reference stores JSON
  * blobs like processed-file lists).
  */
final class StateStore(dir: String) {
  private val root: Path = {
    val p = Paths.get(dir)
    Files.createDirectories(p)
    p
  }

  private def fileFor(program: String): Path = {
    require(program.matches("[A-Za-z0-9_.-]+"), s"unsafe program name: $program")
    root.resolve(s"$program.state")
  }

  def get(program: String): Option[String] = {
    val f = fileFor(program)
    if (Files.exists(f)) Some(new String(Files.readAllBytes(f), StandardCharsets.UTF_8))
    else None
  }

  def set(program: String, state: String): Unit = {
    val f = fileFor(program)
    val tmp = root.resolve(s".${f.getFileName}.tmp")
    Files.write(tmp, state.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, f, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def delete(program: String): Unit = Files.deleteIfExists(fileFor(program))
}

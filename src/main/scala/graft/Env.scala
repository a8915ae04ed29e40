package graft

/** Env-var parsing for the driver mains. A malformed value fails loudly
  * with the variable NAME and the bad value — a bare `.toInt` would
  * crash the whole bench/probe with a bare NumberFormatException before
  * any query runs, with nothing pointing at which knob was mistyped.
  */
object Env {
  def intVar(name: String, default: Int): Int =
    sys.env.get(name) match {
      case None => default
      case Some(v) =>
        require(scala.util.Try(v.trim.toInt).isSuccess,
          s"$name must be an integer, got '$v'")
        v.trim.toInt
    }
}

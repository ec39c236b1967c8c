package graft.check

/** Flat (kind, column, args) encoding for persistable checks — what
  * lets a constraint suite live in a table's own storage
  * ([[graft.operators.VersionedStore.setConstraints]]) rather than
  * only in code. Only checks whose semantics are batch-local are
  * encodable ([[Malformed]] is staging-only and excluded); decode of
  * an unknown kind fails loudly rather than silently dropping a
  * constraint.
  */
object CheckCodec {

  /** Multi-column separator — \u0001 never appears in a column name. */
  private val Sep = "\u0001"

  def encode(c: Check): (String, String, Seq[String]) = c match {
    case NotNull(col) => ("notnull", col, Seq.empty)
    case InSet(col, vs) => ("inset", col, vs)
    case NonNegative(col) => ("nonneg", col, Seq.empty)
    case MatchesRegex(col, r) => ("regex", col, Seq(r))
    case Between(col, lo, hi) =>
      ("between", col, Seq(lo.toString, hi.toString))
    case Unique(cols) => ("unique", cols.mkString(Sep), Seq.empty)
    case ColumnsMatchOrdered(exp) =>
      ("columns", exp.mkString(Sep), Seq.empty)
    case other => sys.error(
      s"CheckCodec: ${other.getClass.getSimpleName} is not persistable")
  }

  def decode(kind: String, column: String, args: Seq[String]): Check =
    kind match {
      case "notnull" => NotNull(column)
      case "inset" => InSet(column, args)
      case "nonneg" => NonNegative(column)
      case "regex" => MatchesRegex(column, args.head)
      case "between" =>
        Between(column, args(0).toDouble, args(1).toDouble)
      case "unique" => Unique(column.split(Sep).toSeq)
      case "columns" =>
        ColumnsMatchOrdered(column.split(Sep).toSeq)
      case other => sys.error(s"CheckCodec: unknown check kind $other")
    }
}

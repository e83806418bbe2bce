package graft
object DumpSql {
  def main(args: Array[String]): Unit = {
    print(SqlFrontend.sqlFor(args(0)).get)
  }
}

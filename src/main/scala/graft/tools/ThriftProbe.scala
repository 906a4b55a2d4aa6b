package graft.tools

import java.sql.DriverManager

/** Scratch probe: connect to a running graft thrift-server the way
  * beeline would (HiveServer2 JDBC protocol) and run queries. */
object ThriftProbe {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.getOrElse("10123")
    Class.forName("org.apache.hive.jdbc.HiveDriver")
    val conn = DriverManager.getConnection(s"jdbc:hive2://localhost:$port/default", "", "")
    try {
      val st = conn.createStatement()
      val rs = st.executeQuery("SELECT 41 + 1 AS answer, field('cp','nocp','cp') AS f")
      rs.next()
      println(s"THRIFT_ANSWER=${rs.getInt(1)} FIELD=${rs.getInt(2)}")
      val rs2 = st.executeQuery(
        "SELECT count(*) FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`")
      rs2.next()
      println(s"THRIFT_LINEITEM=${rs2.getLong(1)}")
    } finally conn.close()
  }
}

package graft

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

/** S21 end-to-end: a real HiveServer2-protocol client (the hive-jdbc
  * driver beeline itself uses) connects to the embedded
  * HiveThriftServer2 and runs SQL — the automated version of the
  * reference's beeline REPL flow (playground.py:672-677). */
class ThriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("beeline-protocol client round-trips SQL through HiveThriftServer2") {
    val port = 10000 + scala.util.Random.nextInt(5000)
    spark.conf.set("hive.server2.thrift.port", port.toString)
    val server = org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
      .startWithContext(spark.sqlContext)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      // the server binds asynchronously; retry the connect briefly
      var conn: java.sql.Connection = null
      var attempts = 0
      while (conn == null && attempts < 50) {
        try conn = DriverManager.getConnection(s"jdbc:hive2://localhost:$port", "root", "")
        catch { case _: Exception => attempts += 1; Thread.sleep(200) }
      }
      assert(conn != null, s"could not connect to thrift server on $port")
      try {
        val st = conn.createStatement()
        // engine functions must be visible through the wire protocol too
        val rs = st.executeQuery(
          "SELECT 1 + 1 AS two, field('cp', 'nocp', 'cp') AS f")
        assert(rs.next())
        assert(rs.getInt("two") == 2)
        assert(rs.getInt("f") == 2)
        assert(!rs.next())
      } finally conn.close()
    } finally server.stop()
  }
}

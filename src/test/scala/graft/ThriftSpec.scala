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
    // the port conf is only read when the session's HiveConf snapshot is
    // built, which other specs may have done already — so ask the running
    // server which port it actually bound instead of assuming ours stuck
    val requested = 10000 + scala.util.Random.nextInt(5000)
    spark.conf.set("hive.server2.thrift.port", requested.toString)
    System.setProperty("hive.server2.thrift.port", requested.toString)
    val server = org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
      .startWithContext(spark.sqlContext)
    try {
      import scala.jdk.CollectionConverters._
      var bound = 0
      var waits = 0
      while (bound <= 0 && waits < 50) {
        bound = server.getServices.asScala.collectFirst {
          case t: org.apache.hive.service.cli.thrift.ThriftCLIService
              if t.getPortNumber > 0 => t.getPortNumber
        }.getOrElse(0)
        if (bound <= 0) { waits += 1; Thread.sleep(200) }
      }
      assert(bound > 0, "thrift service never reported a bound port")
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      // the server binds asynchronously; retry the connect briefly
      var conn: java.sql.Connection = null
      var attempts = 0
      while (conn == null && attempts < 50) {
        try conn = DriverManager.getConnection(s"jdbc:hive2://localhost:$bound", "root", "")
        catch { case _: Exception => attempts += 1; Thread.sleep(200) }
      }
      assert(conn != null, s"could not connect to thrift server on $bound")
      try {
        val st = conn.createStatement()
        // engine functions must be visible through the wire protocol too
        val rs = st.executeQuery(
          "SELECT 1 + 1 AS two, field('cp', 'nocp', 'cp') AS f")
        assert(rs.next())
        assert(rs.getInt("two") == 2)
        assert(rs.getInt("f") == 2)
        assert(!rs.next())
        // REPL-surface parity for the q238 script-transform form: the
        // same TRANSFORM ... USING text a beeline user types must run
        // over the wire protocol (no-serde delimited wire format). The
        // view is created through the connection too — the server runs
        // its own SQL session, which does not see test-side temp views.
        st.execute(
          """CREATE OR REPLACE TEMPORARY VIEW thrift_tx AS
            |SELECT * FROM VALUES (0L, 'P-0'), (1L, 'P-1'), (2L, 'P-2')
            |AS t(id, tag)""".stripMargin)
        val trs = st.executeQuery(
          """SELECT TRANSFORM(id, tag)
            |  ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t'
            |  USING 'sed s/-/_/'
            |  AS (k BIGINT, tag STRING)
            |  ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t'
            |FROM thrift_tx ORDER BY k""".stripMargin)
        val got = Iterator.continually(trs)
          .takeWhile(_.next()).map(r => (r.getLong(1), r.getString(2))).toList
        assert(got == List((0L, "P_0"), (1L, "P_1"), (2L, "P_2")), got)
      } finally conn.close()
    } finally server.stop()
  }
}

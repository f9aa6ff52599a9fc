package graft

import java.sql.DriverManager
import org.apache.spark.sql.functions._

/** S4 relational-store substrate: the reference keeps its users in an
  * RDBMS behind the ORM (SQLite, `crowd_surveillance/crowd_surveillance/
  * settings.py:78-83`; point lookup on login, `app/views.py:27`). The
  * engine's JDBC read path covers that store — Derby embedded is the
  * driver available in this container; the semantics under test
  * (predicate pushdown into the DB, partitioned parallel reads) are
  * driver-agnostic. */
class JdbcSourceSpec extends SparkSpec {

  // one embedded database per suite, seeded with an auth_user-shaped table
  private lazy val dbPath: String = {
    System.setProperty("derby.stream.error.file", "/tmp/graft_derby.log")
    val dir = java.nio.file.Files.createTempDirectory("graft_derby").toString + "/usersdb"
    val conn = DriverManager.getConnection(s"jdbc:derby:$dir;create=true")
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE users (id BIGINT NOT NULL PRIMARY KEY, " +
        "username VARCHAR(64) NOT NULL, email VARCHAR(128))")
      st.close()
      val ins = conn.prepareStatement("INSERT INTO users VALUES (?, ?, ?)")
      (1 to 50).foreach { i =>
        ins.setLong(1, i.toLong)
        ins.setString(2, s"user$i")
        ins.setString(3, s"user$i@example.test")
        ins.addBatch()
      }
      ins.executeBatch()
      ins.close()
    } finally conn.close()
    dir
  }
  private def url = s"jdbc:derby:$dbPath"

  test("usersJdbc round-trips the relational user table") {
    import spark.implicits._
    val rows = Tables.usersJdbc(spark, url)
      .select(col("id").cast("long"), col("username"))
      .as[(Long, String)].collect().toSet
    assert(rows.size == 50)
    assert(rows.contains((7L, "user7")))
  }

  test("point lookup pushes the username predicate into the database (views.py:27)") {
    import spark.implicits._
    val df = Tables.usersJdbc(spark, url).filter(col("username") === "user7")
    val plan = df.queryExecution.executedPlan.toString
    // the lookup must reach the DB as WHERE username = ..., not a full pull
    assert(plan.contains("PushedFilters") &&
      plan.toLowerCase.contains("equalto(username,user7"), plan.take(800))
    assert(df.select(col("id").cast("long")).as[Long].collect().toSeq == Seq(7L))
  }

  test("writeJdbc round-trips a frame into the relational store (views.py:49-52 registration)") {
    import spark.implicits._
    val out = (51 to 60).map(i => (i.toLong, s"user$i", s"user$i@example.test"))
      .toDF("id", "username", "email")
    graft.sources.Writers.writeJdbc(out, url, "users_out")
    val back = Tables.usersJdbc(spark, url, "users_out")
      .select(col("id").cast("long"), col("username"))
      .as[(Long, String)].collect().toSet
    assert(back == (51 to 60).map(i => (i.toLong, s"user$i")).toSet)
  }

  test("V4 hash-verify against the JDBC-backed credential store (views.py:27-34)") {
    import graft.operators.Relational
    // the credential dim lands in the RDBMS (the reference's actual
    // substrate), is read back through the JDBC source, and the SAME
    // verdict logic that q_auth oracle-checks over parquet must agree
    graft.sources.Writers.writeJdbc(Relational.authUsers(spark, sf), url, "auth_users")
    val got = Relational.authVerdicts(
        Tables.usersJdbc(spark, url, "auth_users"), Relational.authAttempts(spark, sf))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val want = Relational.authenticate(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == want)
    // all four dispatch branches are live in the fixture
    assert(Set("ok", "bad_password", "inactive", "no_user").subsetOf(want.map(_._2)))
  }

  test("partitioned JDBC read splits the key range into concurrent per-range queries") {
    val df = Tables.usersJdbcPartitioned(spark, url, "users", "id",
      lowerBound = 1L, upperBound = 51L, numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 50)
  }
}

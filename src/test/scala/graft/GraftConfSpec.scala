package graft

import graft.sources.GraftConf
import org.scalatest.funsuite.AnyFunSuite

/** GraftConf: the reference's typed INI config surface (GraphConf,
  * rg.py:368-414) — sections, comments, typed getters with fallbacks,
  * clear errors on missing required keys — plus Cli flag>config>fallback
  * precedence. */
class GraftConfSpec extends AnyFunSuite {

  private val ini =
    """# engine config
      |[main]
      |events = false
      |
      |[store]
      |path = /data/store
      |batch_size = 20
      |
      |[inputs]
      |commits = /data/commits.txt
      |artifacts = /data/artifacts.parquet
      |prdim: /data/prdim.parquet   ; colon separator + trailing comment-ish
      |""".stripMargin

  test("parses sections, comments, both separators; typed getters") {
    val c = GraftConf.parseString(ini)
    assert(c.get("store", "path") === "/data/store")
    assert(c.getInt("store", "batch_size", 7) === 20)
    assert(c.getInt("store", "missing", 7) === 7)
    assert(c.getBoolean("main", "events", true) === false)
    assert(c.getBoolean("main", "builds", true) === true)
    assert(c.get("inputs", "prdim").startsWith("/data/prdim.parquet"))
    val e = intercept[IllegalArgumentException](c.get("github", "api_key"))
    assert(e.getMessage.contains("[github] api_key"))
  }

  test("configparser semantics: later duplicate key wins") {
    val c = GraftConf.parseString("[a]\nk = 1\nk = 2\n")
    assert(c.getInt("a", "k", 0) === 2)
  }

  test("Cli precedence: flags override config; config fills gaps") {
    val dir = java.nio.file.Files.createTempDirectory("conf_").toString
    val p = s"$dir/graft.ini"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p), ini)
    val conf = Cli.parse(Array("fetch", s"--config=$p",
      "--commits=/override/commits.txt", "--noop"))
    assert(conf.commits === "/override/commits.txt") // flag wins
    assert(conf.store === "/data/store") // config fills
    assert(conf.writeEvents === false) // [main] events=false honored
    assert(conf.writeBuilds === true)
    assert(conf.noop === true)
    val err = intercept[RuntimeException](Cli.parse(Array("fetch")))
    assert(err.getMessage.contains("required"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Api

/** The REST-facade parity map (r6 ask #7): every declared route resolves,
  * binds its path parameters, and points only at real registry entries. */
class ApiSpec extends AnyFunSuite {

  test("every route's registry queries exist in the registry") {
    val names = SparkEntry.queries.keySet
    Api.routes.foreach { r =>
      val missing = r.registryQueries.filterNot(names)
      assert(missing.isEmpty, s"${r.path}: unknown registry queries $missing")
    }
  }

  test("all five reference API routes are mapped") {
    assert(Api.routes.map(_.path).toSet === Set(
      "/emote_stats", "/user/{username}", "/user/{username}/emote/{emote}",
      "/channels", "/channel/{channel}"))
  }

  test("path resolution binds parameters per route") {
    val (r1, b1) = Api.resolve("/user/moo").get
    assert(r1.path == "/user/{username}" && b1 == Map("username" -> "moo"))
    val (r2, b2) = Api.resolve("/user/moo/emote/Kappa").get
    assert(r2.path == "/user/{username}/emote/{emote}" &&
      b2 == Map("username" -> "moo", "emote" -> "Kappa"))
    val (r3, b3) = Api.resolve("/channel/somechan").get
    assert(r3.path == "/channel/{channel}" && b3 == Map("channel" -> "somechan"))
    val (r4, b4) = Api.resolve("/channels").get
    assert(r4.registryQueries == Seq("q2_visible_channel_totals") && b4.isEmpty)
    val (r5, _) = Api.resolve("/emote_stats").get
    assert(r5.queryParams == Seq("emotes"))
  }

  test("unknown or malformed paths do not resolve") {
    assert(Api.resolve("/nope").isEmpty)
    assert(Api.resolve("/user").isEmpty)
    assert(Api.resolve("/user//emote/Kappa").isEmpty)
    assert(Api.resolve("/channel/a/b").isEmpty)
  }
}

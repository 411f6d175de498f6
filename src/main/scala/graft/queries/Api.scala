package graft.queries

/** REST-facade parity map — the last user-visible surface of the reference
  * not yet mirrored 1:1 (VERDICT r6 ask #7): each route of the reference
  * dashboard's JSON API (ApiController.php:23-194) is declared with the
  * registry queries that compute its payload, so a user of the reference
  * can find the exact engine entry behind every endpoint they call today.
  *
  * This is a routing TABLE, not a web server: serving is out of engine
  * scope here exactly as ingest is (SURVEY §2 S9) — the table pins the
  * mapping and the path-template matcher so a thin HTTP layer can be
  * bolted on without touching the engine. Query-string/path parameters are
  * declared per route; each maps onto a filter column of the underlying
  * registry query's output (the registry entries themselves are
  * parameter-free and oracle-checked — a serving layer applies the
  * parameter as a post-filter or pushes it into the DataFrame before
  * collect, both plan-equivalent point filters at serving time).
  *
  * Route ↔ reference map:
  *  - `/emote_stats` (ApiController.php:30-65): all-time emote occurrences
  *    per visible channel, optional emote-list filter → a9/a6 totals with
  *    q2's hidden-channel semi-join; payload columns = q6's.
  *  - `/user/{username}` (ApiController.php:70-97): per-channel message
  *    totals (q1 point lookup) + last-seen (q3).
  *  - `/user/{username}/emote/{emote}` (ApiController.php:102-119): LEFT
  *    JOIN against the visible-channel dimension, NULL→0 → q4.
  *  - `/channels` (ApiController.php:124-136): all-time totals of visible
  *    channels → q2.
  *  - `/channel/{channel}` (ApiController.php:141-194): totals + trailing
  *    5min/1h/24h/7d/30d sums (q5) + top-10 emotes (q6).
  */
object Api {

  /** One JSON API route: its path template (`{x}` = path parameter), the
    * query-string parameters it accepts, and the registry queries that
    * compute its payload (every name is a key of `Registry.entries`). */
  final case class Route(path: String, queryParams: Seq[String],
                         registryQueries: Seq[String], ref: String)

  val routes: Seq[Route] = Seq(
    Route("/emote_stats", Seq("emotes"),
      Seq("q6_top_emotes", "q2_visible_channel_totals"),
      "ApiController.php:30-65"),
    Route("/user/{username}", Nil,
      Seq("q1_point_lookup_totals", "q3_last_seen"),
      "ApiController.php:70-97"),
    Route("/user/{username}/emote/{emote}", Nil,
      Seq("q4_left_join_default"),
      "ApiController.php:102-119"),
    Route("/channels", Nil,
      Seq("q2_visible_channel_totals"),
      "ApiController.php:124-136"),
    Route("/channel/{channel}", Nil,
      Seq("q1_point_lookup_totals", "q5_trailing_sums", "q6_top_emotes"),
      "ApiController.php:141-194"))

  /** Match a concrete request path against the route table: literal
    * segments must equal, `{x}` segments bind any non-empty value. Returns
    * the route and the bound path parameters. */
  def resolve(path: String): Option[(Route, Map[String, String])] = {
    val segs = path.stripPrefix("/").split("/", -1).toSeq
    routes.iterator.flatMap { r =>
      val pat = r.path.stripPrefix("/").split("/", -1).toSeq
      if (pat.length != segs.length) None
      else {
        val binds = pat.zip(segs).foldLeft(Option(Map.empty[String, String])) {
          case (None, _) => None
          case (Some(m), (p, s)) if p.startsWith("{") && p.endsWith("}") =>
            if (s.nonEmpty) Some(m + (p.substring(1, p.length - 1) -> s)) else None
          case (Some(m), (p, s)) => if (p == s) Some(m) else None
        }
        binds.map(r -> _)
      }
    }.nextOption()
  }
}

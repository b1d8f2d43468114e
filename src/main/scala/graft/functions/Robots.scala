package graft.functions

/** Minimal RFC 9309 (robots.txt) evaluator — the crawl-compliance half a
  * web-corpus ingest pipeline runs next to q304's politeness scheduling:
  * group selection by user-agent (specific group wins over `*`; absent
  * both, everything is allowed), then longest-prefix-match among the
  * selected group's Allow/Disallow rules, Allow winning length ties.
  *
  * Scope (honest): prefix rules only — the `*`/`$` wildcard extension is
  * not implemented (it is optional in the RFC; a rule containing them is
  * treated literally). Agent matching is the RFC's product-token prefix
  * match, case-insensitive.
  */
object Robots {

  /** One rule: allow? + path prefix (empty prefix matches everything). */
  final case class Rule(allow: Boolean, prefix: String)

  /** Parsed groups: lowercased agent token -> rules in file order.
    * Consecutive User-agent lines share the following rule block (RFC
    * 9309 §2.2.1). Unknown directives are ignored; a rule line before
    * any User-agent line is ignored (no group to attach to).
    */
  def parse(txt: String): Map[String, Vector[Rule]] = {
    val groups = scala.collection.mutable.Map.empty[String, Vector[Rule]]
    var currentAgents: List[String] = Nil
    var collectingAgents = true
    txt.split('\n').foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            val a = value.toLowerCase
            currentAgents = if (collectingAgents) a :: currentAgents else List(a)
            collectingAgents = true
          case "allow" | "disallow" if value.nonEmpty =>
            collectingAgents = false
            currentAgents.foreach { a =>
              groups(a) = groups.getOrElse(a, Vector.empty) :+
                Rule(key == "allow", value)
            }
          case "allow" | "disallow" => // empty value: no rule (RFC: allow all)
            collectingAgents = false
          case _ => () // crawl-delay, sitemap, unknown — not access rules
        }
      }
    }
    groups.toMap
  }

  /** Select the rule group for `agent`: the longest agent token that
    * prefix-matches (case-insensitive), else the `*` group, else none.
    */
  def groupFor(groups: Map[String, Vector[Rule]], agent: String): Vector[Rule] = {
    val a = agent.toLowerCase
    val specific = groups.keys.filter(k => k != "*" && a.startsWith(k))
    specific.toSeq.sortBy(-_.length).headOption
      .map(groups)
      .orElse(groups.get("*"))
      .getOrElse(Vector.empty)
  }

  /** Verdict for one path: (allowed, overridden) where `overridden` means
    * a Disallow rule matched but a LONGER (or equal-length — Allow wins
    * ties) Allow rule carried the verdict.
    */
  def evaluate(rules: Vector[Rule], path: String): (Boolean, Boolean) = {
    val matching = rules.filter(r => path.startsWith(r.prefix))
    if (matching.isEmpty) (true, false)
    else {
      val maxLen = matching.map(_.prefix.length).max
      val winners = matching.filter(_.prefix.length == maxLen)
      val allowed = winners.exists(_.allow) // Allow wins a length tie
      (allowed, allowed && matching.exists(!_.allow))
    }
  }
}

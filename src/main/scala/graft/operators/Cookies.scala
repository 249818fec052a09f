package graft.operators

/** Cookie bookkeeping (G3 — ≙ `/root/reference/src/clj/ramper/workers/
  * fetching_thread.clj:134-150`): per-host cookie set truncated greedily to a
  * byte budget. Vestigial under the synthetic stateless server but part of
  * the operator inventory; the `host_state` table would carry the map.
  */
object Cookies {

  /** Estimated wire size of one cookie (name=value; ≙ cookie-size estimate
    * at fetching_thread.clj:134-139). */
  def cookieSize(name: String, value: String): Int =
    name.length + value.length + 1

  /** Keep cookies in order while the running size fits maxBytes; drop the
    * rest (greedy scan, ≙ limit-cookies fetching_thread.clj:141-150;
    * reference default budget 2048 bytes, runtime_configuration.clj:31). */
  def limitCookies(cookies: Seq[(String, String)], maxBytes: Int = 2048): Seq[(String, String)] = {
    var budget = maxBytes
    cookies.takeWhile { case (n, v) =>
      budget -= cookieSize(n, v)
      budget >= 0
    }
  }
}

package graft.filters

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode

/** The four post-read content filters — the only content-level query
  * semantics in the reference (`/root/reference/src/aerovaldb/utils/
  * filter.py:6-84`). They subset a stored document after point lookup.
  *
  * Implemented over the Jackson AST because document schemas are
  * dynamic (the store is schema-on-read). For DataFrame-wide use the
  * same filters are exposed as Column transforms in
  * [[graft.analytics.AssetFrames]] where a schema is known.
  */
object ContentFilters {

  /** `data[variable][network][layer]` path extraction (`filter.py:6-15`). */
  def filterRegionalStats(data: JsonNode, variable: String, network: String, layer: String): JsonNode = {
    val v = data.get(variable)
    if (v == null) throw new NoSuchElementException(s"key '$variable'")
    val n = v.get(network)
    if (n == null) throw new NoSuchElementException(s"key '$network'")
    val l = n.get(layer)
    if (l == null) throw new NoSuchElementException(s"key '$layer'")
    l
  }

  /** Walk variable→network→layer→model→modvar, keep only the
    * `[region][time]` leaf where present — preserving EMPTY SHELLS for
    * every upper key (`filter.py:18-46`): keys without the leaf still
    * appear with `{}` at the level they reached. */
  def filterHeatmap(data: JsonNode, region: String, time: String): JsonNode = {
    val out = JsonUtil.mapper.createObjectNode()
    data.properties().forEach { ve =>
      val vOut = JsonUtil.mapper.createObjectNode()
      out.set[JsonNode](ve.getKey, vOut)
      ve.getValue.properties().forEach { ne =>
        val nOut = JsonUtil.mapper.createObjectNode()
        vOut.set[JsonNode](ne.getKey, nOut)
        ne.getValue.properties().forEach { le =>
          val lOut = JsonUtil.mapper.createObjectNode()
          nOut.set[JsonNode](le.getKey, lOut)
          le.getValue.properties().forEach { me =>
            val mOut = JsonUtil.mapper.createObjectNode()
            lOut.set[JsonNode](me.getKey, mOut)
            me.getValue.properties().forEach { mve =>
              val mvOut = JsonUtil.mapper.createObjectNode()
              mOut.set[JsonNode](mve.getKey, mvOut)
              val regionData = mve.getValue.get(region)
              if (regionData != null) {
                val timeData = regionData.get(time)
                if (timeData != null) {
                  val regionOut = JsonUtil.mapper.createObjectNode()
                  regionOut.set[JsonNode](time, timeData)
                  mvOut.set[JsonNode](region, regionOut)
                }
              }
            }
          }
        }
      }
    }
    out
  }

  /** `data[timestep]`, identity when timestep is None (`filter.py:49-53`). */
  def filterContour(data: JsonNode, timestep: Option[String]): JsonNode =
    timestep match {
      case None => data
      case Some(t) =>
        val v = data.get(t)
        if (v == null) throw new NoSuchElementException(s"key '$t'")
        v
    }

  /** Per-station projection (`filter.py:56-84`): keep only the fixed
    * station fields plus `frequency`; inside `[frequency]`, keep only
    * `season`. Both-or-neither validation on the two params. */
  def filterMap(data: JsonNode, frequency: Option[String], season: Option[String]): JsonNode =
    (frequency, season) match {
      case (None, None) => data
      case (Some(freq), Some(seas)) =>
        val keep = Set("station_name", "latitude", "longitude", "altitude",
          "region", "station_display_name", freq)
        val out = JsonUtil.mapper.createArrayNode()
        data.forEach { item =>
          val o = item.deepCopy[ObjectNode]()
          val keys = {
            val b = Seq.newBuilder[String]
            o.fieldNames().forEachRemaining(b += _)
            b.result()
          }
          keys.foreach { k =>
            if (!keep.contains(k)) o.remove(k)
            else {
              // reference touches item[frequency] for every kept key —
              // missing frequency is an error (filter.py:70-76)
              val freqNode = o.get(freq)
              if (freqNode == null) throw new NoSuchElementException(s"key '$freq'")
              freqNode match {
                case fo: ObjectNode =>
                  val fkeys = {
                    val b = Seq.newBuilder[String]
                    fo.fieldNames().forEachRemaining(b += _)
                    b.result()
                  }
                  fkeys.foreach(k2 => if (k2 != seas) fo.remove(k2))
                case _ =>
              }
            }
          }
          out.add(o)
        }
        out
      case _ =>
        throw new IllegalArgumentException(
          s"frequency and season must either both be None, or both be provided. Got ${Seq(frequency, season)}")
    }
}

package graft

import java.nio.file.Files

import graft.meta.MetadataStore
import org.apache.spark.sql.functions._

/** Metadata transport payload shapes (file / vinculum site / tpflow
 *  registry) feeding the one broadcast-enrichment dimension. */
class MetadataSpec extends SparkSpec {
  import spark.implicits._

  private def writeJson(content: String): String = {
    val f = Files.createTempFile(graft.Fixtures.newDir("graft_meta"),
      "graft_meta", ".json")
    Files.write(f, content.getBytes)
    f.toFile.getAbsolutePath
  }

  test("vinculum site shape: per-service rows, composeType semantics (vinc_store.go)") {
    val path = writeJson(
      """{"devices":[
        |  {"id":5,"room":2,"type":{"type":"meter","subtype":"main_elec"},
        |   "services":[{"name":"meter_elec","addr":"/rt:dev/rn:z/ad:1/sv:meter_elec/ad:2"},
        |               {"name":"sensor_power","addr":"/rt:dev/rn:z/ad:1/sv:sensor_power/ad:2"}]},
        |  {"id":7,"room":null,"type":{"type":"thermostat"},
        |   "services":[{"name":"thermostat","addr":"/rt:dev/rn:z/ad:2/sv:thermostat/ad:1"}]},
        |  {"id":9,"room":3,"type":{},
        |   "services":[{"name":"x","address":"/rt:dev/rn:z/ad:3/sv:x/ad:1"}]}
        |]}""".stripMargin)
    val dim = MetadataStore.loadVincSite(spark, path)
    val rows = dim.collect().map(r => (r.getAs[String]("address"),
      r.getAs[Int]("device_id"), r.getAs[Any]("location_id"), r.getAs[String]("device_type"))).toSet
    assert(rows == Set(
      ("/rt:dev/rn:z/ad:1/sv:meter_elec/ad:2", 5, 2, "meter.main_elec"),
      ("/rt:dev/rn:z/ad:1/sv:sensor_power/ad:2", 5, 2, "meter.main_elec"),
      ("/rt:dev/rn:z/ad:2/sv:thermostat/ad:1", 7, null, "thermostat"), // no subtype
      ("/rt:dev/rn:z/ad:3/sv:x/ad:1", 9, 3, ""))) // untyped → "" (composeType)
    // same dimension drives enrichment
    val events = Seq("pt:j1/mt:evt/rt:dev/rn:z/ad:1/sv:meter_elec/ad:2").toDF("topic")
    val enriched = MetadataStore.enrich(events, dim).collect().head
    assert(enriched.getAs[String]("dev_id") == "5")
    assert(enriched.getAs[String]("dev_type") == "meter.main_elec")
    // and the regroup maps (vinc_store.go:63-109)
    val byLoc = MetadataStore.devicesGroupedBy(dim, "location")
      .distinct().collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(byLoc.contains(("5", "2")) && byLoc.contains(("9", "3")))
  }

  test("tpflow registry shape: container_id becomes device id (tp_store.go:44-50)") {
    val path = writeJson(
      """[{"id":1,"address":"/rt:dev/rn:z/ad:1/sv:sensor_temp/ad:2",
        |  "integr_id":"zw","container_id":42,"container_type":"device","location_id":7},
        | {"id":2,"address":"/rt:dev/rn:z/ad:2/sv:sensor_hum/ad:1",
        |  "integr_id":"zw","container_id":43,"container_type":"device","location_id":8}]""".stripMargin)
    val dim = MetadataStore.loadTpRegistry(spark, path)
    val rows = dim.collect().map(r => (r.getAs[String]("address"),
      r.getAs[Int]("device_id"), r.getAs[Int]("location_id"))).toSet
    assert(rows == Set(
      ("/rt:dev/rn:z/ad:1/sv:sensor_temp/ad:2", 42, 7),
      ("/rt:dev/rn:z/ad:2/sv:sensor_hum/ad:1", 43, 8)))
    val events = Seq("pt:j1/mt:cmd/rt:dev/rn:z/ad:2/sv:sensor_hum/ad:1").toDF("topic")
    val enriched = MetadataStore.enrich(events, dim).collect().head
    assert(enriched.getAs[String]("dev_id") == "43")
    assert(enriched.getAs[String]("location_id") == "8")
    assert(enriched.getAs[String]("dev_type") == null) // reference leaves type empty
    // provider wrapping gives the same periodic re-sync path the file store has
    val p = MetadataStore.tpProvider(spark, path, refreshIntervalMs = 0)
    assert(p.current().count() == 2)
  }
}

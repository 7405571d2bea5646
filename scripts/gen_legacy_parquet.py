"""Generate GOLDEN parquet files in every LogicalTypes.md backward-compat
list layout, written by the genuine reference writer (parquet-java's
ExampleParquetWriter, from the jars bundled with the Spark distribution).

These layouts cannot be produced by pyarrow (it always writes the standard
3-level form), so the fixtures are committed as binaries under
``tests/golden/legacy/`` and this script documents their provenance.
Layouts covered (parquet-format LogicalTypes.md "Backward-compatibility
rules"):

  1. two_level.parquet      — ``repeated int32 element`` directly under the
                              LIST group (old parquet-mr / Spark
                              writeLegacyFormat, non-null elements)
  2. array_named.parquet    — repeated GROUP named ``array`` under LIST
                              (the group itself is the element struct)
  3. tuple_named.parquet    — repeated group named ``<field>_tuple``
  4. multi_field.parquet    — repeated group with >1 child field
  5. unannotated_leaf.parquet  — bare ``repeated int32 a`` (protobuf style,
                              no LIST annotation at all)
  6. unannotated_group.parquet — bare repeated group (thrift/protobuf
                              converters)

Run: ``python scripts/gen_legacy_parquet.py`` (starts a local Spark JVM).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "legacy")

SCHEMAS = {
    "two_level": """
        message m {
          optional group a (LIST) { repeated int32 element; }
          required int32 id;
        }
    """,
    "array_named": """
        message m {
          optional group a (LIST) {
            repeated group array { required int32 x; optional binary y (UTF8); }
          }
        }
    """,
    "tuple_named": """
        message m {
          required group a (LIST) {
            repeated group a_tuple { required int32 x; }
          }
        }
    """,
    "multi_field": """
        message m {
          optional group a (LIST) {
            repeated group element { required int32 x; required double z; }
          }
        }
    """,
    "unannotated_leaf": """
        message m { repeated int32 a; required int32 id; }
    """,
    "unannotated_group": """
        message m {
          repeated group a { required int32 x; optional binary y (UTF8); }
        }
    """,
}


def main():
    from pyspark.sql import SparkSession

    os.makedirs(OUT, exist_ok=True)
    spark = (SparkSession.builder.master("local[1]")
             .appName("gen-legacy").getOrCreate())
    jvm = spark._jvm
    parser = jvm.org.apache.parquet.schema.MessageTypeParser
    conf = spark._jsc.hadoopConfiguration()

    def writer_for(path, schema_str):
        mt = parser.parseMessageType(schema_str)
        jvm.org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(
            mt, conf)
        hpath = jvm.org.apache.hadoop.fs.Path("file://" + path)
        b = jvm.org.apache.parquet.hadoop.example.ExampleParquetWriter.builder(
            hpath)
        b = b.withConf(conf).withType(mt)
        return b.build(), jvm.org.apache.parquet.example.data.simple.SimpleGroupFactory(mt)

    def write(name, fill):
        path = os.path.abspath(os.path.join(OUT, name + ".parquet"))
        if os.path.exists(path):
            os.remove(path)
        w, gf = writer_for(path, SCHEMAS[name])
        fill(w, gf)
        w.close()
        crc = path + ".crc" if False else os.path.join(
            os.path.dirname(path), "." + os.path.basename(path) + ".crc")
        if os.path.exists(crc):
            os.remove(crc)
        print("wrote", path)

    def fill_two_level(w, gf):
        for i in range(50):
            g = gf.newGroup()
            g.add("id", i)
            if i % 7 != 3:  # list present
                lst = g.addGroup("a")
                for k in range(i % 5):
                    lst.add("element", i * 10 + k)
            w.write(g)

    def fill_array_named(w, gf):
        for i in range(40):
            g = gf.newGroup()
            if i % 6 != 2:
                lst = g.addGroup("a")
                for k in range(i % 4):
                    el = lst.addGroup("array")
                    el.add("x", i + k)
                    if (i + k) % 3 != 1:
                        el.add("y", f"s{i}_{k}")
            w.write(g)

    def fill_tuple_named(w, gf):
        for i in range(30):
            g = gf.newGroup()
            lst = g.addGroup("a")
            for k in range(i % 3):
                el = lst.addGroup("a_tuple")
                el.add("x", i * 100 + k)
            w.write(g)

    def fill_multi_field(w, gf):
        for i in range(30):
            g = gf.newGroup()
            if i % 5 != 4:
                lst = g.addGroup("a")
                for k in range(i % 4):
                    el = lst.addGroup("element")
                    el.add("x", i + k)
                    el.add("z", i * 0.5 + k)
            w.write(g)

    def fill_unannotated_leaf(w, gf):
        for i in range(50):
            g = gf.newGroup()
            g.add("id", i)
            for k in range(i % 4):
                g.add("a", i * 1000 + k)
            w.write(g)

    def fill_unannotated_group(w, gf):
        for i in range(40):
            g = gf.newGroup()
            for k in range(i % 3):
                el = g.addGroup("a")
                el.add("x", i + k)
                if k % 2 == 0:
                    el.add("y", f"g{i}_{k}")
            w.write(g)

    write("two_level", fill_two_level)
    write("array_named", fill_array_named)
    write("tuple_named", fill_tuple_named)
    write("multi_field", fill_multi_field)
    write("unannotated_leaf", fill_unannotated_leaf)
    write("unannotated_group", fill_unannotated_group)
    spark.stop()


if __name__ == "__main__":
    main()

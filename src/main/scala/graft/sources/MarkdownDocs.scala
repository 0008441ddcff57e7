package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Markdown document publisher (SURVEY.md §2.1 S10 — reference:
  * scripts/publish_docs.py:172-219): parse YAML-ish frontmatter + body from
  * markdown files into typed document rows for the embed pipeline.
  *
  * Schema mirrors the reference's document record (publish_docs.py:63-109):
  * (doc_id, text, pages, section_reference, title, fraud_categories[],
  * policy_keywords[], char_count).
  *
  * Parsing is pure Column expressions over `spark.read.text(wholetext)` —
  * one task per file, no driver parsing, scales to any corpus size.
  */
object MarkdownDocs {

  /** Read every .md under `path` (recursively with glob), parse frontmatter. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("wholetext", "true").text(path)
      .withColumn("file", input_file_name())
    parse(raw, "value", "file")
  }

  /** Parse frontmatter-bearing text rows: `---\nkey: value...\n---\nbody`. */
  def parse(df: DataFrame, textCol: String, fileCol: String): DataFrame = {
    val fm = regexp_extract(col(textCol), "(?s)\\A---\\n(.*?)\\n---\\n", 1)
    val body = regexp_replace(col(textCol), "(?s)\\A---\\n.*?\\n---\\n", "")
    def field(k: String) = regexp_extract(fm, s"(?m)^$k:\\s*(.+?)\\s*$$", 1)
    def listField(k: String) =
      filter(transform(split(field(k), ","), x => trim(regexp_replace(x, "[\\[\\]']", ""))),
        x => x =!= "")
    df.select(
      abs(xxhash64(col(fileCol))).as("doc_id"),
      body.as("text"),
      field("pages").cast("int").as("pages"),
      field("section_reference").as("section_reference"),
      field("title").as("title"),
      listField("fraud_categories").as("fraud_categories"),
      listField("policy_keywords").as("policy_keywords"),
      length(body).cast("int").as("char_count"))
  }
}

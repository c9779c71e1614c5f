package graft.pipeline

/** The reference's one real row type (dags/classes/Person.py:6-14): seven
  * string fields; `grade`/`age` default to '' (Person.py:13-14). The
  * engine keeps typed/nullable columns internally and projects into this
  * string-shaped record only at the output boundary, matching the
  * reference's empty-string-never-null discipline
  * (dags/tasks/planning_center.py:65,70,78,82).
  */
final case class Person(
    person_id: String,
    person_list: String,
    name: String,
    primary_email: String,
    primary_phone_number: String,
    grade: String,
    age: String)
